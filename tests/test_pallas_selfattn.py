"""Locality-tiled Pallas BEV self-attention vs the XLA oracles
(interpret mode on CPU).

Oracles: the GLOBAL one-hot path (``deformable_sample_attend``) — exact
within the locality domain — and the XLA grid-tiled path it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbbev_tpu.ops.deform_attn import (
    deformable_sample_attend, deformable_sample_attend_grid_tiled)
from fbbev_tpu.ops.pallas_selfattn import (
    deformable_self_attend_pallas, supports)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _grid_case(rng, B, H, W, heads, hd, P, max_off):
    """Self-attention case: queries ARE the (H, W) grid; sampling locs =
    own cell centre + bounded offsets (the BEVFormer locality contract)."""
    Q = H * W
    v = jnp.asarray(rng.randn(B, Q, heads, hd).astype(np.float32))
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ref = np.stack([(xx.ravel() + 0.5) / W, (yy.ravel() + 0.5) / H], -1)
    off = rng.uniform(-max_off, max_off,
                      (B, Q, heads, P, 2)).astype(np.float32)
    loc = jnp.asarray(ref[None, :, None, None, :]
                      + off / np.asarray([W, H], np.float32))
    attn = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Q, heads, P).astype(np.float32)), axis=-1)
    return v, loc, attn


def test_matches_global_onehot_small(rng):
    B, H, W, heads, hd, P = 2, 24, 28, 4, 8, 4
    v, loc, attn = _grid_case(rng, B, H, W, heads, hd, P, max_off=6.0)
    want = np.asarray(deformable_sample_attend(
        v, (H, W), loc, attn, chunk_q=96))
    got = np.asarray(deformable_self_attend_pallas(
        v, (H, W), loc, attn, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_matches_grid_tiled_flagship_shape(rng):
    # flagship BEV self-attn shape (B kept at 1 for test time)
    B, H, W, heads, hd, P = 1, 100, 100, 8, 10, 4
    assert supports((H, W), heads * hd, H * W, heads * P)
    v, loc, attn = _grid_case(rng, B, H, W, heads, hd, P, max_off=5.0)
    want = np.asarray(deformable_sample_attend_grid_tiled(
        v, (H, W), loc, attn))
    got = np.asarray(deformable_self_attend_pallas(
        v, (H, W), loc, attn, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_out_of_grid_zero_pad(rng):
    # edge queries sampling outside the grid: zero-pad semantics match
    # the global one-hot path (weights drop, no clamping)
    B, H, W, heads, hd, P = 1, 24, 28, 2, 8, 4
    v, loc, attn = _grid_case(rng, B, H, W, heads, hd, P, max_off=0.0)
    # push every sample 3 cells outward from its own cell toward the
    # nearest border (edge cells land outside the grid)
    loc = loc + jnp.where(loc < 0.5, -3.0, 3.0) / jnp.asarray(
        [W, H], jnp.float32)
    want = np.asarray(deformable_sample_attend(
        v, (H, W), loc, attn, chunk_q=96))
    got = np.asarray(deformable_self_attend_pallas(
        v, (H, W), loc, attn, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_bf16_value(rng):
    B, H, W, heads, hd, P = 1, 24, 28, 4, 8, 4
    v, loc, attn = _grid_case(rng, B, H, W, heads, hd, P, max_off=4.0)
    want = np.asarray(deformable_sample_attend(
        v.astype(jnp.bfloat16), (H, W), loc, attn, chunk_q=96))
    got = np.asarray(deformable_self_attend_pallas(
        v.astype(jnp.bfloat16), (H, W), loc, attn, interpret=True))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.03 * scale


def test_module_routes_through_kernel(rng, monkeypatch):
    """DeformableSelfAttention(eval) through the interpret hook equals
    the XLA grid-tiled routing bit-for-bit at f32."""
    import flax.linen as nn  # noqa: F401
    from fbbev_tpu.models.bevformer import DeformableSelfAttention

    B, H, W = 1, 24, 28
    Q, C = H * W, 80
    attn_mod = DeformableSelfAttention(embed_dims=C, num_heads=8,
                                       num_points=4)
    q = jnp.asarray(rng.randn(B, Q, C).astype(np.float32))
    qpos = jnp.asarray(rng.randn(B, Q, C).astype(np.float32) * 0.1)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ref = jnp.asarray(np.stack([(xx.ravel() + 0.5) / W,
                                (yy.ravel() + 0.5) / H],
                               -1)[None].astype(np.float32))
    params = attn_mod.init(jax.random.PRNGKey(0), q, qpos, ref, (H, W))

    monkeypatch.delenv("FBBEV_PALLAS_SELFATTN", raising=False)
    monkeypatch.delenv("FBBEV_FORCE_PALLAS_SELFATTN", raising=False)
    want = attn_mod.apply(params, q, qpos, ref, (H, W))

    monkeypatch.setenv("FBBEV_PALLAS_SELFATTN", "1")
    monkeypatch.setenv("FBBEV_FORCE_PALLAS_SELFATTN", "interpret")
    got = attn_mod.apply(params, q, qpos, ref, (H, W))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
