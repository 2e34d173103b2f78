import jax
import jax.numpy as jnp
import numpy as np

from fbbev_tpu.ops import bev_pool, lss_voxel_pool


def test_bev_pool_reference_selftest():
    """Replicates the reference kernel's numeric self-test
    (/root/reference/mmdet3d/ops/bev_pool_v2/bev_pool.py:144-175):
    forward sum == 4.4 and exact depth/feat gradients."""
    depth = jnp.asarray([0.3, 0.4, 0.2, 0.1, 0.7, 0.6, 0.8, 0.9],
                        jnp.float32)
    feat = jnp.ones((4, 2), jnp.float32)  # 4 pixels x 2 channels
    ranks_depth = jnp.asarray([0, 4, 1, 6], jnp.int32)
    ranks_feat = jnp.asarray([0, 0, 1, 2], jnp.int32)
    ranks_bev = jnp.asarray([0, 0, 1, 1], jnp.int32)

    def loss_fn(d, f):
        out = bev_pool(d, f, ranks_depth, ranks_feat, ranks_bev, 8)
        return jnp.sum(out)

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(depth, feat)
    assert abs(float(loss) - 4.4) < 1e-6
    np.testing.assert_allclose(
        np.asarray(grads[0]), [2., 2., 0., 0., 2., 0., 2., 0.], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grads[1]).ravel(), [1.0, 1.0, 0.4, 0.4, 0.8, 0.8, 0., 0.],
        atol=1e-6)


def _brute_force_pool(coor, depth, feat, lower, interval, grid_size):
    B, N, D, fH, fW, _ = coor.shape
    nx, ny, nz = grid_size
    C = feat.shape[-1]
    out = np.zeros((B, ny, nx, nz, C), np.float32)
    for b in range(B):
        for n in range(N):
            for d in range(D):
                for h in range(fH):
                    for w in range(fW):
                        c = (coor[b, n, d, h, w] - lower) / interval
                        ci = c.astype(np.int32)  # trunc toward 0
                        if (
                            0 <= ci[0] < nx and 0 <= ci[1] < ny
                            and 0 <= ci[2] < nz
                        ):
                            out[b, ci[1], ci[0], ci[2]] += (
                                depth[b, n, d, h, w] * feat[b, n, h, w]
                            )
    return out


def test_lss_voxel_pool_vs_bruteforce(rng):
    B, N, D, fH, fW, C = 2, 2, 3, 2, 3, 4
    grid_size = (5, 6, 2)
    lower = np.array([-2.0, -2.4, -1.0], np.float32)
    interval = np.array([0.8, 0.8, 1.0], np.float32)
    coor = (rng.rand(B, N, D, fH, fW, 3).astype(np.float32) * 6 - 3)
    depth = rng.rand(B, N, D, fH, fW).astype(np.float32)
    feat = rng.randn(B, N, fH, fW, C).astype(np.float32)

    out = np.asarray(lss_voxel_pool(
        jnp.asarray(coor), jnp.asarray(depth), jnp.asarray(feat),
        lower, interval, grid_size))
    ref = _brute_force_pool(coor, depth, feat, lower, interval, grid_size)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_lss_voxel_pool_sorted_equals_unsorted(rng):
    B, N, D, fH, fW, C = 1, 2, 4, 3, 3, 2
    coor = (rng.rand(B, N, D, fH, fW, 3).astype(np.float32) * 4 - 2)
    depth = rng.rand(B, N, D, fH, fW).astype(np.float32)
    feat = rng.randn(B, N, fH, fW, C).astype(np.float32)
    kwargs = dict(grid_lower=[-2.0, -2.0, -2.0], grid_interval=[1.0, 1.0, 1.0],
                  grid_size=(4, 4, 4))
    a = np.asarray(lss_voxel_pool(jnp.asarray(coor), jnp.asarray(depth),
                                  jnp.asarray(feat), sort_points=True,
                                  **kwargs))
    b = np.asarray(lss_voxel_pool(jnp.asarray(coor), jnp.asarray(depth),
                                  jnp.asarray(feat), sort_points=False,
                                  **kwargs))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pool_custom_vjp_matches_autodiff(rng, monkeypatch):
    """FBBEV_POOL_VJP=1 (hand-written backward, the TPU analogue of the
    reference's two-pass interval backward, bev_pool_cuda.cu:64-118):
    forward and both input gradients must match the XLA-autodiff
    segment-sum path exactly, including zero gradient for out-of-grid
    (dump-routed) points and under jit."""
    B, N, D, fH, fW, C = 2, 2, 3, 2, 3, 4
    kwargs = dict(grid_lower=[-2.0, -2.4, -1.0],
                  grid_interval=[0.8, 0.8, 1.0], grid_size=(5, 6, 2))
    # spread well outside the grid so dump routing is exercised
    coor = jnp.asarray(rng.rand(B, N, D, fH, fW, 3).astype(np.float32)
                       * 6 - 3)
    depth = jnp.asarray(rng.rand(B, N, D, fH, fW).astype(np.float32))
    feat = jnp.asarray(rng.randn(B, N, fH, fW, C).astype(np.float32))
    cot = jnp.asarray(rng.randn(B, 6, 5, 2, C).astype(np.float32))

    def loss(d, f):
        return jnp.sum(lss_voxel_pool(coor, d, f, **kwargs) * cot)

    monkeypatch.delenv("FBBEV_POOL_VJP", raising=False)
    ref_out = lss_voxel_pool(coor, depth, feat, **kwargs)
    ref_gd, ref_gf = jax.grad(loss, argnums=(0, 1))(depth, feat)

    monkeypatch.setenv("FBBEV_POOL_VJP", "1")
    got_out = lss_voxel_pool(coor, depth, feat, **kwargs)
    got_gd, got_gf = jax.jit(jax.grad(loss, argnums=(0, 1)))(depth, feat)

    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gd), np.asarray(ref_gd),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gf), np.asarray(ref_gf),
                               atol=1e-5)
