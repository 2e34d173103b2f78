"""Pallas blocked-im2col 3x3 conv vs XLA's conv_general_dilated.

Runs in Pallas interpret mode on the CPU test platform; the same kernel is
compiled by Mosaic on TPU (exercised by bench/serving).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fbbev_tpu.ops import pallas_conv


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("B,H,W,Cin,Cout", [
    (1, 16, 16, 64, 64),
    (2, 20, 28, 64, 128),
    (3, 8, 24, 128, 64),
])
def test_conv3x3_matches_xla(B, H, W, Cin, Cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout).astype(np.float32) * 0.05)
    ref = _xla_conv(x, w)
    out = pallas_conv.conv3x3_s1(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv3x3_bf16_accumulates_f32():
    rng = np.random.RandomState(1)
    B, H, W, Cin, Cout = 1, 16, 16, 64, 64
    x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32)).astype(
        jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout).astype(np.float32) * 0.05)
    ref = _xla_conv(x.astype(jnp.float32),
                    w.astype(jnp.bfloat16).astype(jnp.float32))
    out = pallas_conv.conv3x3_s1(x, w.astype(jnp.bfloat16), interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out).astype(np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-1)


def test_conv3x3_custom_vjp_matches_xla_grads():
    rng = np.random.RandomState(2)
    B, H, W, Cin, Cout = 2, 12, 16, 64, 64
    x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout).astype(np.float32) * 0.05)

    def loss_pl(x, w):
        return jnp.sum(pallas_conv.conv3x3(x, w) ** 2)

    def loss_xla(x, w):
        return jnp.sum(_xla_conv(x, w) ** 2)

    gx_p, gw_p = jax.grad(loss_pl, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               rtol=1e-3, atol=1e-2)
