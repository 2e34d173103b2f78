import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fbbev_tpu.ops import grid_sample_2d, grid_sample_3d


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_2d_vs_torch(rng, align_corners):
    B, H, W, C = 2, 7, 11, 5
    img = rng.randn(B, H, W, C).astype(np.float32)
    grid = (rng.rand(B, 4, 6, 2).astype(np.float32) * 2.4 - 1.2)  # incl. OOB

    ours = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid),
                                     align_corners=align_corners))
    ref = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_3d_vs_torch(rng, align_corners):
    B, D, H, W, C = 2, 4, 5, 6, 3
    vol = rng.randn(B, D, H, W, C).astype(np.float32)
    grid = (rng.rand(B, 3, 4, 5, 3).astype(np.float32) * 2.4 - 1.2)

    ours = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid),
                                     align_corners=align_corners))
    ref = F.grid_sample(
        torch.from_numpy(vol).permute(0, 4, 1, 2, 3),
        torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=align_corners,
    ).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_2d_gradients(rng):
    import jax
    B, H, W, C = 1, 5, 5, 2
    img = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    grid = jnp.asarray(rng.rand(B, 3, 3, 2).astype(np.float32) * 1.6 - 0.8)

    def f(im):
        return jnp.sum(grid_sample_2d(im, grid) ** 2)

    g = jax.grad(f)(img)
    assert np.isfinite(np.asarray(g)).all()


def test_grid_sample_3d_tiled_matches_reference(rng):
    """Tiled sampler must exactly match grid_sample_3d on a rotated+shifted
    (affine) warp grid, including out-of-volume zero padding."""
    from fbbev_tpu.ops.grid_sample import grid_sample_3d_tiled
    B, D, H, W, C = 1, 8, 16, 16, 6
    vol = jnp.asarray(rng.randn(B, D, H, W, C).astype(np.float32))
    # affine grid: rotation ~30deg + translation, in normalized coords
    ang = np.deg2rad(30.0)
    ca, sa = np.cos(ang), np.sin(ang)
    ys, xs, zs = np.meshgrid(
        np.linspace(-1, 1, H), np.linspace(-1, 1, W),
        np.linspace(-1, 1, D), indexing="ij")
    gx = ca * xs - sa * ys + 0.12
    gy = sa * xs + ca * ys - 0.08
    gz = zs + 0.05
    grid = np.stack([gx, gy, gz], -1)  # (H, W, D, 3)
    grid = np.transpose(grid, (2, 0, 1, 3))[None].astype(np.float32)
    ref = grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid))
    out = grid_sample_3d_tiled(jnp.asarray(vol), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_grid_sample_3d_tiled_identity(rng):
    from fbbev_tpu.ops.grid_sample import grid_sample_3d_tiled
    B, D, H, W, C = 2, 4, 8, 8, 3
    vol = jnp.asarray(rng.randn(B, D, H, W, C).astype(np.float32))
    zs, ys, xs = np.meshgrid(
        np.linspace(-1, 1, D), np.linspace(-1, 1, H),
        np.linspace(-1, 1, W), indexing="ij")
    grid = np.broadcast_to(
        np.stack([xs, ys, zs], -1)[None], (B, D, H, W, 3)).astype(np.float32)
    out = grid_sample_3d_tiled(jnp.asarray(vol), jnp.asarray(grid),
                               slab_xy=8, tile=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-5)
