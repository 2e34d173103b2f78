"""Pallas affine history-warp kernel vs the exact XLA trilinear sampler.

Runs in Pallas interpret mode on the CPU test platform; the same kernel is
compiled by Mosaic on TPU (exercised by bench/serving).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fbbev_tpu.ops.grid_sample import grid_sample_3d
from fbbev_tpu.ops import pallas_warp


def _flow(theta_deg, tx, ty, tz=0.0, pitch=0.0):
    th = np.deg2rad(theta_deg)
    M = np.eye(4, dtype=np.float32)
    M[0, 0] = np.cos(th)
    M[0, 1] = -np.sin(th)
    M[1, 0] = np.sin(th)
    M[1, 1] = np.cos(th)
    M[0, 3], M[1, 3], M[2, 3] = tx, ty, tz
    M[2, 0] = pitch
    return M


def _ref_grid(mat, D, H, W):
    norm = jnp.array([W - 1.0, H - 1.0, D - 1.0], jnp.float32)
    ys, xs, zs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        jnp.arange(D, dtype=jnp.float32), indexing="ij")
    g = jnp.stack([xs, ys, zs, jnp.ones_like(xs)], -1)
    warped = jnp.einsum("bij,hwzj->bhwzi", mat, g)[..., :3]
    return jnp.transpose(warped / norm * 2.0 - 1.0, (0, 3, 1, 2, 4))


@pytest.mark.parametrize("theta,tx,ty,tz,pitch", [
    (0.0, 0.0, 0.0, 0.0, 0.0),
    (5.0, 3.7, -2.2, 0.3, 0.01),
    (-17.0, -6.0, 4.0, -0.4, -0.02),
    (30.0, 0.5, 0.5, 0.0, 0.0),
    (0.0, 120.0, 0.0, 0.0, 0.0),   # everything out of volume -> zeros
])
def test_warp_matches_exact_trilinear(theta, tx, ty, tz, pitch):
    B, D, H, W, C = 1, 8, 40, 40, 128
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(B, D, H, W, C).astype(np.float32))
    mat = jnp.asarray(_flow(theta, tx, ty, tz, pitch))[None]

    ref = grid_sample_3d(vol, _ref_grid(mat, D, H, W), align_corners=True)
    out = pallas_warp.warp_affine_3d(vol, mat, out_zyx=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    out2 = pallas_warp.warp_affine_3d(vol, mat, out_zyx=False,
                                      interpret=True)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(jnp.transpose(ref, (0, 2, 3, 1, 4))),
        rtol=1e-4, atol=1e-4)


def test_supports_gate():
    assert pallas_warp.supports((1, 8, 100, 100, 1280))
    assert not pallas_warp.supports((1, 8, 25, 25, 1280))   # H % TILE
    assert not pallas_warp.supports((1, 8, 100, 100, 80))   # C % 128
    assert not pallas_warp.supports((1, 2, 100, 100, 128))  # D < ZBAND
