// Host-side data-plane kernels for the fbbev_tpu framework.
//
// The reference implements its hot index math in CUDA inside the training
// graph (/root/reference/mmdet3d/ops/bev_pool_v2/src/bev_pool.cpp and the
// voxel_pooling_prepare_v2 sort at view_transformer.py:547-605).  On TPU
// the device-side pooling is a segment-sum; what remains hot on the HOST
// is the per-sample geometry/index precompute for the fixed-camera serving
// path and the LiDAR depth rasterisation in the training input pipeline.
// Those live here, exported with a plain C ABI for ctypes.
//
// Build: make -C csrc   (produces libfbbev_host.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Quantise ego-frame frustum points to voxel ranks.
//
//   coor:      P x 3 float (x, y, z) ego coordinates
//   batch_idx: P int32 sample index per point
//   ranks_bev: P int32 out; invalid points get `num_voxels`
//
// Rank layout (X fastest) matches fbbev_tpu.geometry.voxel_ranks:
//   b*(nz*ny*nx) + cz*(ny*nx) + cy*nx + cx
// Truncation toward zero mirrors torch .long() / jnp astype(int32).
void compute_voxel_ranks(const float* coor, const int32_t* batch_idx,
                         int64_t P, const float* grid_lower,
                         const float* grid_interval, int32_t nx, int32_t ny,
                         int32_t nz, int32_t num_samples,
                         int32_t* ranks_bev) {
  const int64_t per_sample = (int64_t)nz * ny * nx;
  const int32_t num_voxels = (int32_t)(per_sample * num_samples);
  for (int64_t p = 0; p < P; ++p) {
    const float* c = coor + 3 * p;
    int32_t cx = (int32_t)((c[0] - grid_lower[0]) / grid_interval[0]);
    int32_t cy = (int32_t)((c[1] - grid_lower[1]) / grid_interval[1]);
    int32_t cz = (int32_t)((c[2] - grid_lower[2]) / grid_interval[2]);
    bool valid = cx >= 0 && cx < nx && cy >= 0 && cy < ny && cz >= 0 &&
                 cz < nz;
    ranks_bev[p] =
        valid ? (int32_t)(batch_idx[p] * per_sample + (int64_t)cz * ny * nx +
                          (int64_t)cy * nx + cx)
              : num_voxels;
  }
}

// Sort point ids by voxel rank and emit contiguous voxel intervals --
// the serving-path precompute equivalent of the reference's
// init_acceleration_v2 (view_transformer.py:500-519).
//
// Returns the number of intervals written.  order/interval buffers must
// hold P entries.
int64_t sort_ranks_intervals(const int32_t* ranks_bev, int64_t P,
                             int32_t* order, int32_t* ranks_sorted,
                             int32_t* interval_starts,
                             int32_t* interval_lengths) {
  std::vector<int32_t> idx(P);
  std::iota(idx.begin(), idx.end(), 0);
  std::stable_sort(idx.begin(), idx.end(), [&](int32_t a, int32_t b) {
    return ranks_bev[a] < ranks_bev[b];
  });
  for (int64_t i = 0; i < P; ++i) {
    order[i] = idx[i];
    ranks_sorted[i] = ranks_bev[idx[i]];
  }
  int64_t n_intervals = 0;
  for (int64_t i = 0; i < P; ++i) {
    if (i == 0 || ranks_sorted[i] != ranks_sorted[i - 1]) {
      if (n_intervals > 0) {
        interval_lengths[n_intervals - 1] =
            (int32_t)(i - interval_starts[n_intervals - 1]);
      }
      interval_starts[n_intervals++] = (int32_t)i;
    }
  }
  if (n_intervals > 0) {
    interval_lengths[n_intervals - 1] =
        (int32_t)(P - interval_starts[n_intervals - 1]);
  }
  return n_intervals;
}

// Z-buffered min-depth rasterisation of projected LiDAR points
// (PointToMultiViewDepth.points2depthmap, loading.py:883-907).
//
//   points: P x 3 float (u_px, v_px, depth)
//   depth_map: H x W float out (zero-initialised by this function)
void rasterize_depth(const float* points, int64_t P, int32_t H, int32_t W,
                     float depth_lo, float depth_hi, float* depth_map) {
  std::memset(depth_map, 0, sizeof(float) * H * W);
  for (int64_t p = 0; p < P; ++p) {
    float u = std::round(points[3 * p + 0]);
    float v = std::round(points[3 * p + 1]);
    float d = points[3 * p + 2];
    if (u < 0 || u >= W || v < 0 || v >= H || d < depth_lo || d >= depth_hi)
      continue;
    float& cell = depth_map[(int64_t)v * W + (int64_t)u];
    if (cell == 0.0f || d < cell) cell = d;
  }
}

// Normalise a uint8 HWC image with per-channel mean/std into float32.
// (The pixel-count-heavy part of PrepareImageInputs.)
void normalize_image_u8(const uint8_t* src, int64_t n_pixels,
                        const float* mean, const float* inv_std,
                        float* dst) {
  for (int64_t i = 0; i < n_pixels; ++i) {
    const uint8_t* s = src + 3 * i;
    float* d = dst + 3 * i;
    d[0] = ((float)s[0] - mean[0]) * inv_std[0];
    d[1] = ((float)s[1] - mean[1]) * inv_std[1];
    d[2] = ((float)s[2] - mean[2]) * inv_std[2];
  }
}

}  // extern "C"
