import jax.numpy as jnp
import numpy as np
import pytest

from fbbev_tpu import geometry
from fbbev_tpu.geometry import CamParams


GRID = dict(x=(-40, 40, 0.8), y=(-40, 40, 0.8), z=(-1, 5.4, 0.8),
            depth=(2.0, 42.0, 0.5))


def random_cam_params(rng, B=2, N=3):
    quats = rng.randn(B, N, 4)
    rots = np.stack(
        [
            np.stack([geometry.quat_to_rot(quats[b, n]) for n in range(N)])
            for b in range(B)
        ]
    ).astype(np.float32)
    trans = rng.randn(B, N, 3).astype(np.float32)
    intrins = np.broadcast_to(np.eye(3, dtype=np.float32), (B, N, 3, 3)).copy()
    intrins[..., 0, 0] = 800 + 10 * rng.rand(B, N)
    intrins[..., 1, 1] = 800 + 10 * rng.rand(B, N)
    intrins[..., 0, 2] = 352.0
    intrins[..., 1, 2] = 128.0
    # post aug: scale + small rotation + translation in pixel space
    ang = 0.05 * rng.randn(B, N)
    scale = 0.4 + 0.05 * rng.rand(B, N)
    post_rots = np.zeros((B, N, 3, 3), np.float32)
    post_rots[..., 0, 0] = scale * np.cos(ang)
    post_rots[..., 0, 1] = -scale * np.sin(ang)
    post_rots[..., 1, 0] = scale * np.sin(ang)
    post_rots[..., 1, 1] = scale * np.cos(ang)
    post_rots[..., 2, 2] = 1.0
    post_trans = np.zeros((B, N, 3), np.float32)
    post_trans[..., :2] = 10 * rng.randn(B, N, 2)
    bda = np.stack(
        [geometry.rot_z(a) for a in 0.3 * rng.randn(B)]
    ).astype(np.float32)
    return CamParams(*(jnp.asarray(a) for a in
                       (rots, trans, intrins, post_rots, post_trans, bda)))


def test_gen_dx_bx():
    dx, bx, nx = geometry.gen_dx_bx(GRID["x"], GRID["y"], GRID["z"])
    np.testing.assert_allclose(dx, [0.8, 0.8, 0.8], rtol=1e-6)
    np.testing.assert_allclose(bx, [-39.6, -39.6, -0.6], rtol=1e-5)
    np.testing.assert_array_equal(nx, [100, 100, 8])


def test_create_frustum():
    f = geometry.create_frustum(GRID["depth"], (256, 704), 16)
    assert f.shape == (80, 16, 44, 3)
    np.testing.assert_allclose(f[:, 0, 0, 2], np.arange(2.0, 42.0, 0.5))
    np.testing.assert_allclose(f[0, 0, :, 0], np.linspace(0, 703, 44))
    np.testing.assert_allclose(f[0, :, 0, 1], np.linspace(0, 255, 16))


def test_frustum_to_ego_pinhole_identity():
    """With identity extrinsics/augs, lifting is the pinhole inverse."""
    f = geometry.create_frustum((2.0, 42.0, 0.5), (256, 704), 16)
    B, N = 1, 1
    intr = np.eye(3, dtype=np.float32)
    fx, fy, cx, cy = 500.0, 510.0, 352.0, 128.0
    intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2] = fx, fy, cx, cy
    cam = CamParams(
        rots=jnp.eye(3)[None, None],
        trans=jnp.zeros((B, N, 3)),
        intrins=jnp.asarray(intr)[None, None],
        post_rots=jnp.eye(3)[None, None],
        post_trans=jnp.zeros((B, N, 3)),
        bda=jnp.eye(3)[None],
    )
    pts = np.asarray(geometry.frustum_to_ego(jnp.asarray(f), cam))[0, 0]
    u, v, d = f[..., 0], f[..., 1], f[..., 2]
    np.testing.assert_allclose(pts[..., 0], (u - cx) / fx * d, rtol=1e-4)
    np.testing.assert_allclose(pts[..., 1], (v - cy) / fy * d, rtol=1e-4)
    np.testing.assert_allclose(pts[..., 2], d, rtol=1e-5)


def test_project_roundtrip(rng):
    """frustum->ego->pixels must return the original pixel coords."""
    cam = random_cam_params(rng, B=2, N=3)
    f = geometry.create_frustum((2.0, 42.0, 10.0), (256, 704), 64)
    ego = geometry.frustum_to_ego(jnp.asarray(f), cam)  # (B,N,D,h,w,3)
    B, N, D, h, w, _ = ego.shape
    for b in range(B):
        for n in range(N):
            pts = ego[b, n].reshape(-1, 3)
            uv, mask, depth = geometry.ego_to_cam_pixels(
                pts, cam, (256, 704))
            uvn = np.asarray(uv)[b, n]
            exp_u = f[..., 0].reshape(-1) / 704
            exp_v = f[..., 1].reshape(-1) / 256
            exp_d = f[..., 2].reshape(-1)
            np.testing.assert_allclose(uvn[:, 0], exp_u, atol=2e-4)
            np.testing.assert_allclose(uvn[:, 1], exp_v, atol=2e-4)
            np.testing.assert_allclose(
                np.asarray(depth)[b, n], exp_d, rtol=1e-3)


def test_bev_reference_points_3d():
    ref = geometry.bev_reference_points_3d((-40, 40, 0.8), (-40, 40, 0.8),
                                           (-1, 5.4, 1.6))
    assert ref.shape == (100, 100, 4, 3)
    np.testing.assert_allclose(ref[0, 0, :, 2], [-0.2, 1.4, 3.0, 4.6],
                               atol=1e-5)
    np.testing.assert_allclose(ref[0, :3, 0, 0], [-39.6, -38.8, -38.0],
                               atol=1e-5)
    np.testing.assert_allclose(ref[:3, 0, 0, 1], [-39.6, -38.8, -38.0],
                               atol=1e-5)


def test_voxel_coords_truncation_matches_torch_long():
    """(coor-lower)/interval in (-1,0) truncates to 0 and is kept, matching
    the reference's .long() edge behaviour."""
    pts = jnp.asarray([[-40.4, 0.0, 0.0], [-40.9, 0.0, 0.0]])
    ci, valid = geometry.voxel_coords(
        pts, jnp.asarray([-40.0, -40.0, -1.0]), jnp.asarray([0.8, 0.8, 0.8]),
        (100, 100, 8))
    assert ci[0, 0] == 0 and bool(valid[0])   # -0.5 -> 0, kept
    assert ci[1, 0] == -1 and not bool(valid[1])


def test_history_flow_grid_identity():
    eye = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    dx, bx, _ = geometry.gen_dx_bx(GRID["x"], GRID["y"], GRID["z"])
    f2b = geometry.feat2bev_matrix(dx, bx)
    grid = geometry.history_flow_grid(eye, eye, eye, jnp.asarray(f2b),
                                      (8, 100, 100))
    assert grid.shape == (2, 8, 100, 100, 3)
    # identity transform -> grid equals the normalised identity sample grid
    g = np.asarray(grid)[0]
    xs = np.arange(100) / 99.0 * 2 - 1
    np.testing.assert_allclose(g[0, 0, :, 0], xs, atol=1e-5)
    np.testing.assert_allclose(g[0, :, 0, 1], xs, atol=1e-5)
    np.testing.assert_allclose(g[:, 0, 0, 2], np.arange(8) / 7.0 * 2 - 1,
                               atol=1e-5)


def test_history_flow_grid_translation():
    """Ego moved +0.8m in x between frames => sample previous volume one
    cell over."""
    eye = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    c2p = jnp.asarray(np.array([[[1, 0, 0, 0.8], [0, 1, 0, 0],
                                 [0, 0, 1, 0], [0, 0, 0, 1]]], np.float32))
    dx, bx, _ = geometry.gen_dx_bx(GRID["x"], GRID["y"], GRID["z"])
    f2b = geometry.feat2bev_matrix(dx, bx)
    grid = geometry.history_flow_grid(eye, eye, c2p, jnp.asarray(f2b),
                                      (8, 100, 100))
    g = np.asarray(grid)[0]
    # x index shifted by +1 cell: normalised offset = 2/99
    base = np.arange(100) / 99.0 * 2 - 1
    np.testing.assert_allclose(g[0, 0, :, 0], base + 2.0 / 99.0, atol=1e-5)
    np.testing.assert_allclose(g[0, :, 0, 1], base, atol=1e-5)


def test_quat_to_rot_matches_axis_angle():
    # 90 deg about z: q = (cos45, 0, 0, sin45)
    q = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    R = geometry.quat_to_rot(q)
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0],
                               atol=1e-7)
