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
