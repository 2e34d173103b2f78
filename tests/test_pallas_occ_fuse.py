"""Fused multi-scale upsample+blend kernel vs the XLA resize path.

Runs in Pallas interpret mode on the CPU test platform; the same kernel is
compiled by Mosaic on TPU (exercised by bench/serving).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fbbev_tpu.models.layers import _upsample_int_axis, resize_trilinear
from fbbev_tpu.ops.pallas_occ_fuse import fuse_multiscale


def _ref(levels, w, target):
    up = [lv if lv.shape[1:4] == target
          else resize_trilinear(lv, target, align_corners=False)
          for lv in levels]
    return sum(f * w[..., i:i + 1] for i, f in enumerate(up))


@pytest.mark.parametrize("B,Y,X,Z,C", [(1, 16, 16, 16, 128),
                                       (2, 8, 24, 16, 64)])
def test_fuse_multiscale_matches_xla(B, Y, X, Z, C):
    rng = np.random.RandomState(0)
    shapes = [(Y, X, Z), (Y // 2, X // 2, Z // 2), (Y // 4, X // 4, Z // 4)]
    levels = [jnp.asarray(rng.randn(B, *s, C).astype(np.float32))
              for s in shapes]
    w = jnp.asarray(rng.rand(B, Y, X, Z, len(levels)).astype(np.float32))

    ref = _ref(levels, w, (Y, X, Z))
    levels_y = [lv if lv.shape[1] == Y
                else _upsample_int_axis(lv, 1, Y // lv.shape[1])
                for lv in levels]
    got = fuse_multiscale(levels_y, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fuse_multiscale_bf16():
    rng = np.random.RandomState(1)
    B, Y, X, Z, C = 1, 8, 16, 16, 64
    shapes = [(Y, X, Z), (Y // 2, X // 2, Z // 2)]
    levels = [jnp.asarray(rng.randn(B, *s, C).astype(np.float32)).astype(
        jnp.bfloat16) for s in shapes]
    w = jnp.asarray(rng.rand(B, Y, X, Z, 2).astype(np.float32)).astype(
        jnp.bfloat16)
    ref = _ref([lv.astype(jnp.float32) for lv in levels],
               w.astype(jnp.float32), (Y, X, Z))
    levels_y = [levels[0], _upsample_int_axis(levels[1], 1, 2)]
    got = fuse_multiscale(levels_y, w, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got).astype(np.float32),
                               np.asarray(ref), rtol=3e-2, atol=3e-1)
