"""Pallas fused deformable sampling vs the XLA one-hot oracle
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbbev_tpu.ops.deform_attn import (bilinear_sample_onehot,
                                       deformable_sample_attend)
from fbbev_tpu.ops.pallas_sample import (bilinear_sample_pallas,
                                         deformable_sample_attend_pallas)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_bilinear_sample_matches_onehot(rng):
    B, H, W, C, S = 2, 16, 44, 80, 512
    v = jnp.asarray(rng.randn(B, H * W, C).astype(np.float32))
    # locations spanning in-bounds, borders, and fully outside
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, (B, S, 2)).astype(np.float32))
    want = np.asarray(bilinear_sample_onehot(v, (H, W), loc, chunk=256))
    got = np.asarray(bilinear_sample_pallas(v, (H, W), loc, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_deform_attend_matches_onehot(rng):
    B, H, W, heads, hd, Q, P = 2, 16, 44, 8, 10, 64, 8
    v = jnp.asarray(rng.randn(B, H * W, heads, hd).astype(np.float32))
    loc = jnp.asarray(
        rng.uniform(-0.1, 1.1, (B, Q, heads, P, 2)).astype(np.float32))
    attn = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Q, heads, P).astype(np.float32)), axis=-1)
    want = np.asarray(deformable_sample_attend(v, (H, W), loc, attn,
                                               chunk_q=16))
    got = np.asarray(deformable_sample_attend_pallas(
        v, (H, W), loc, attn, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_deform_attend_bf16_value(rng):
    B, H, W, heads, hd, Q, P = 1, 8, 16, 4, 16, 32, 4
    v = jnp.asarray(rng.randn(B, H * W, heads, hd).astype(np.float32))
    loc = jnp.asarray(
        rng.uniform(0.0, 1.0, (B, Q, heads, P, 2)).astype(np.float32))
    attn = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Q, heads, P).astype(np.float32)), axis=-1)
    want = np.asarray(deformable_sample_attend(
        v.astype(jnp.bfloat16), (H, W), loc, attn, chunk_q=16))
    got = np.asarray(deformable_sample_attend_pallas(
        v.astype(jnp.bfloat16), (H, W), loc, attn, interpret=True))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.03 * scale
