"""Geometry core: camera projection, frustum generation, BEV grid math,
ego-motion flow.  Pure jnp functions, no parameters.

Parity notes cite the reference implementation
(``/root/reference/mmdet3d/models/fbbev/...``) whose conventions these
functions reproduce:

* frustum -> ego:  ``view_transformation/forward_projection/view_transformer.py:458-498``
* ego -> camera pixels:  ``view_transformation/backward_projection/bevformer_utils/bevformer_encoder.py:91-120``
* BEV grid (dx/bx/nx):  ``view_transformer.py:17-21``
* voxel ranks: ``view_transformer.py:547-605``
* temporal flow grid: ``detectors/fbocc.py:169-205``

Axis conventions (locked throughout the framework):

* ego/lidar frame: x right, y forward (nuScenes lidar convention as used by
  BEVDet); BEV tensor layout is ``(B, Y, X, Z, C)`` -- channels last, X is
  the fastest spatial axis, matching the reference's rank ordering
  (batch, z, y, x) with x fastest.
* image frame: pixel (u, v) = (x-col, y-row); frustum depth in metres.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class CamParams(NamedTuple):
    """Per-camera geometry for a batch of multi-camera frames.

    Matches the reference's ``cam_params = img[1:7]`` 6-tuple
    (``detectors/fbocc.py:328``).
    """

    rots: jnp.ndarray       # (B, N, 3, 3) sensor->key-ego rotation
    trans: jnp.ndarray      # (B, N, 3)    sensor->key-ego translation
    intrins: jnp.ndarray    # (B, N, 3, 3) camera intrinsics
    post_rots: jnp.ndarray  # (B, N, 3, 3) image-aug homography (rotation/scale)
    post_trans: jnp.ndarray  # (B, N, 3)   image-aug translation
    bda: jnp.ndarray        # (B, 3, 3)    BEV-plane data augmentation


class GridConfig(NamedTuple):
    """BEV voxel grid bounds: each of x/y/z/depth is (lo, hi, step)."""

    x: Tuple[float, float, float]
    y: Tuple[float, float, float]
    z: Tuple[float, float, float]
    depth: Tuple[float, float, float]


def gen_dx_bx(xb: Sequence[float], yb: Sequence[float], zb: Sequence[float]):
    """Grid cell size ``dx``, first-cell center ``bx``, cell counts ``nx``.

    Parity: ``view_transformer.py:17-21``.
    """
    rows = [xb, yb, zb]
    dx = np.array([r[2] for r in rows], np.float32)
    bx = np.array([r[0] + r[2] / 2.0 for r in rows], np.float32)
    nx = np.array([round((r[1] - r[0]) / r[2]) for r in rows], np.int32)
    return dx, bx, nx


def create_frustum(depth_cfg: Sequence[float], input_size: Tuple[int, int],
                   downsample: int) -> np.ndarray:
    """Frustum template ``(D, fH, fW, 3)`` of (u_px, v_px, depth_m).

    Parity: ``view_transformer.py:389-411``.
    """
    h_in, w_in = input_size
    fh, fw = h_in // downsample, w_in // downsample
    d = np.arange(depth_cfg[0], depth_cfg[1], depth_cfg[2], dtype=np.float32)
    D = d.shape[0]
    x = np.linspace(0, w_in - 1, fw, dtype=np.float32)
    y = np.linspace(0, h_in - 1, fh, dtype=np.float32)
    frustum = np.stack(
        [
            np.broadcast_to(x[None, None, :], (D, fh, fw)),
            np.broadcast_to(y[None, :, None], (D, fh, fw)),
            np.broadcast_to(d[:, None, None], (D, fh, fw)),
        ],
        axis=-1,
    )
    return frustum


def frustum_to_ego(frustum: jnp.ndarray, cam: CamParams) -> jnp.ndarray:
    """Lift the frustum of every camera into the (BDA-augmented) ego frame.

    Args:
      frustum: (D, fH, fW, 3) template of (u, v, depth).
      cam: camera parameters.

    Returns:
      (B, N, D, fH, fW, 3) ego-frame xyz.

    Parity: ``view_transformer.py:458-498`` (get_lidar_coor).
    """
    B, N = cam.trans.shape[:2]
    f = frustum.astype(jnp.float32)
    # undo image augmentation: p = inv(post_rot) @ (f - post_tran)
    pts = f[None, None] - cam.post_trans[:, :, None, None, None, :]
    inv_post = jnp.linalg.inv(cam.post_rots)
    pts = jnp.einsum("bnij,bndhwj->bndhwi", inv_post, pts)
    # pixel+depth -> camera xyz: (u*z, v*z, z)
    pts = jnp.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], -1)
    combine = cam.rots @ jnp.linalg.inv(cam.intrins)
    pts = jnp.einsum("bnij,bndhwj->bndhwi", combine, pts)
    pts = pts + cam.trans[:, :, None, None, None, :]
    pts = jnp.einsum("bij,bndhwj->bndhwi", cam.bda, pts)
    return pts


def ego_to_cam_pixels(ref_xyz: jnp.ndarray, cam: CamParams,
                      input_size: Tuple[int, int], eps: float = 1e-5):
    """Project ego-frame points into each camera's augmented image plane.

    Args:
      ref_xyz: (Q, 3) ego-frame points (pre-BDA frame is recovered inside).
      cam: camera parameters.
      input_size: (H, W) of the network input image.

    Returns:
      uv_norm: (B, N, Q, 2) pixel coords normalised to [0, 1] by (W, H).
      mask:    (B, N, Q) bool, in-front-of-camera and inside image.
      depth:   (B, N, Q) metric depth along camera z.

    Parity: ``bevformer_encoder.py:91-120`` (point_sampling); note the
    reference divides by ``max(z, eps)`` (not clamped |z|) and builds the
    mask with an ``eps`` margin on all four image borders.
    """
    B, N = cam.trans.shape[:2]
    H, W = input_size
    pts = jnp.einsum("bij,qj->bqi", jnp.linalg.inv(cam.bda), ref_xyz)
    pts = pts[:, None] - cam.trans[:, :, None, :]  # (B,N,Q,3)
    # combine = inv(rots @ inv(intrins)) = intrins @ inv(rots)
    combine = jnp.linalg.inv(cam.rots @ jnp.linalg.inv(cam.intrins))
    pcam = jnp.einsum("bnij,bnqj->bnqi", combine, pts)
    z = pcam[..., 2:3]
    uv = pcam[..., :2] / jnp.maximum(z, eps)
    pix = jnp.concatenate([uv, z], -1)
    pix = jnp.einsum("bnij,bnqj->bnqi", cam.post_rots, pix)
    pix = pix + cam.post_trans[:, :, None, :]
    u = pix[..., 0] / W
    v = pix[..., 1] / H
    depth = pix[..., 2]
    mask = (
        (depth > eps)
        & (u > eps) & (u < 1.0 - eps)
        & (v > eps) & (v < 1.0 - eps)
    )
    return jnp.stack([u, v], -1), mask, depth


def bev_reference_points_3d(x_bound, y_bound, z_bound) -> np.ndarray:
    """Voxel-center anchors for backward projection: (ny, nx, nz, 3).

    Layout [iy, ix, iz] -> (x_center, y_center, z_center); flattening the
    leading two axes row-major gives query index q = iy*nx + ix, matching
    the BEV feature flatten order.

    Parity: ``bevformer_encoder.py:52-75`` (get_reference_points '3d').
    """
    xs = np.arange(*x_bound, dtype=np.float32) + x_bound[2] / 2.0
    ys = np.arange(*y_bound, dtype=np.float32) + y_bound[2] / 2.0
    zs = np.arange(*z_bound, dtype=np.float32) + z_bound[2] / 2.0
    Y, X, Z = np.meshgrid(ys, xs, zs, indexing="ij")
    # meshgrid(ij) over (ys, xs, zs): axis0 indexes y, axis1 x, axis2 z
    return np.stack([X, Y, Z], axis=-1)


def bev_reference_points_2d(h: int, w: int) -> np.ndarray:
    """Normalised 2D BEV self-attention reference points, (h*w, 2) in [0,1].

    Parity: ``bevformer_encoder.py:77-89`` ('2d' branch): x from w (cols),
    y from h (rows), stacked as (x, y).
    """
    ys = (np.arange(h, dtype=np.float32) + 0.5) / h
    xs = (np.arange(w, dtype=np.float32) + 0.5) / w
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([gx, gy], -1).reshape(h * w, 2)


def voxel_coords(points: jnp.ndarray, grid_lower: jnp.ndarray,
                 grid_interval: jnp.ndarray, grid_size: Sequence[int]):
    """Quantise ego points to integer voxel coords + validity mask.

    ``points``: (..., 3).  Truncation toward zero mirrors torch ``.long()``
    (``view_transformer.py:570-580``) including its edge behaviour for
    values in (-1, 0).
    """
    c = (points - grid_lower) / grid_interval
    ci = c.astype(jnp.int32)  # truncates toward zero, like torch .long()
    nx, ny, nz = int(grid_size[0]), int(grid_size[1]), int(grid_size[2])
    valid = (
        (ci[..., 0] >= 0) & (ci[..., 0] < nx)
        & (ci[..., 1] >= 0) & (ci[..., 1] < ny)
        & (ci[..., 2] >= 0) & (ci[..., 2] < nz)
    )
    return ci, valid


def voxel_ranks(coords: jnp.ndarray, valid: jnp.ndarray,
                grid_size: Sequence[int], batch_idx: jnp.ndarray):
    """Flattened voxel rank per point; invalid points -> num_voxels (dump row).

    Rank layout (X fastest): ``b*(nz*ny*nx) + cz*(ny*nx) + cy*nx + cx``,
    matching ``view_transformer.py:586-589``.

    Args:
      coords: (P, 3) int voxel coords (x, y, z).
      valid: (P,) bool.
      grid_size: (nx, ny, nz).
      batch_idx: (P,) int sample index.

    Returns:
      ranks: (P,) int32 in [0, B*nz*ny*nx], where the max value is the
        dump slot for out-of-grid points.
    """
    nx, ny, nz = int(grid_size[0]), int(grid_size[1]), int(grid_size[2])
    per_sample = nz * ny * nx
    rank = (
        batch_idx.astype(jnp.int32) * per_sample
        + coords[..., 2] * (ny * nx)
        + coords[..., 1] * nx
        + coords[..., 0]
    )
    num_total = per_sample * 0  # placeholder; caller supplies B via batch_idx
    del num_total
    dump = jnp.int32((jnp.max(batch_idx) + 1) * per_sample)
    return jnp.where(valid, rank, dump)


def forward_aug_matrix(bda: jnp.ndarray) -> jnp.ndarray:
    """Embed the (B,3,3) BDA rotation into (B,4,4) homogeneous matrices.

    Parity: ``detectors/fbocc.py:36-41``.
    """
    B = bda.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=bda.dtype), (B, 4, 4))
    return eye.at[:, :3, :3].set(bda)


def feat2bev_matrix(dx: np.ndarray, bx: np.ndarray) -> np.ndarray:
    """BEV (x_idx, y_idx, z_idx, 1) -> ego metres homogeneous transform.

    Parity: ``detectors/fbocc.py:182-191``.
    """
    m = np.zeros((4, 4), np.float32)
    m[0, 0], m[1, 1], m[2, 2] = dx[0], dx[1], dx[2]
    m[0, 3] = bx[0] - dx[0] / 2.0
    m[1, 3] = bx[1] - dx[1] / 2.0
    m[2, 3] = bx[2] - dx[2] / 2.0
    m[3, 3] = 1.0
    return m


def history_flow_grid(history_forward_augs: jnp.ndarray,
                      forward_augs: jnp.ndarray,
                      curr_to_prev_ego_rt: jnp.ndarray,
                      feat2bev: jnp.ndarray,
                      grid_zyx: Tuple[int, int, int]) -> jnp.ndarray:
    """Sampling grid that warps the previous BEV volume into current indices.

    Args:
      history_forward_augs, forward_augs, curr_to_prev_ego_rt: (B, 4, 4).
      feat2bev: (4, 4) from :func:`feat2bev_matrix`.
      grid_zyx: (Z, H=Y, W=X) of the BEV volume.

    Returns:
      (B, Z, H, W, 3) grid, last dim (x, y, z) normalised to [-1, 1] for an
      ``align_corners=True`` trilinear sample of the history volume.

    Parity: ``detectors/fbocc.py:169-205`` (generate_grid) plus the
    ``grid.permute(0, 3, 1, 2, 4)`` at the ``F.grid_sample`` call (:275).
    """
    z, h, w = grid_zyx
    B = forward_augs.shape[0]
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    zs = jnp.arange(z, dtype=jnp.float32)
    gy, gx, gz = jnp.meshgrid(ys, xs, zs, indexing="ij")  # (h, w, z)
    ones = jnp.ones_like(gx)
    grid = jnp.stack([gx, gy, gz, ones], -1)  # (h, w, z, 4)

    rt_flow = (
        jnp.linalg.inv(feat2bev)[None]
        @ history_forward_augs
        @ curr_to_prev_ego_rt
        @ jnp.linalg.inv(forward_augs)
        @ feat2bev[None]
    )  # (B, 4, 4)
    warped = jnp.einsum("bij,hwzj->bhwzi", rt_flow, grid)[..., :3]
    norm = jnp.array([w - 1.0, h - 1.0, z - 1.0], jnp.float32)
    warped = warped / norm * 2.0 - 1.0
    # (B, h, w, z, 3) -> (B, z, h, w, 3): sample-grid layout for grid_sample_3d
    return jnp.transpose(warped, (0, 3, 1, 2, 4))


# --------------------------------------------------------------------------
# quaternion / SE(3) helpers for the data pipeline
# --------------------------------------------------------------------------

def quat_to_rot(q: np.ndarray) -> np.ndarray:
    """(w, x, y, z) quaternion -> 3x3 rotation (pyquaternion convention)."""
    q = np.asarray(q, np.float64)
    w, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def rt_matrix(rotation_quat: np.ndarray, translation: np.ndarray) -> np.ndarray:
    """Homogeneous 4x4 from quaternion + translation."""
    m = np.eye(4)
    m[:3, :3] = quat_to_rot(rotation_quat)
    m[:3, 3] = np.asarray(translation, np.float64)
    return m


def rot_z(angle_rad: float) -> np.ndarray:
    """Rotation about +z (BEV-plane rotation used by BDA augmentation)."""
    c, s = np.cos(angle_rad), np.sin(angle_rad)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], np.float32)
