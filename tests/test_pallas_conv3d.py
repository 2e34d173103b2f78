"""Interpret-mode parity of the Pallas 3x3x3 3D conv vs XLA (SAME, s=1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbbev_tpu.ops import pallas_conv3d


def _xla_conv3d(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("shape,cout", [
    ((2, 8, 10, 4, 64), 64),
    ((1, 10, 8, 2, 128), 128),
    ((1, 5, 5, 8, 64), 128),
])
def test_conv3d_matches_xla(rng, shape, cout):
    assert pallas_conv3d.supports(shape, cout)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    k = jnp.asarray(
        rng.randn(3, 3, 3, shape[-1], cout).astype(np.float32) * 0.05)
    ref = _xla_conv3d(x, k)
    out = pallas_conv3d.conv3d_3x3x3(x, k, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv3d_bf16(rng):
    shape = (1, 8, 8, 4, 64)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(
        jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 3, 64, 64).astype(np.float32) * 0.05
                    ).astype(jnp.bfloat16)
    ref = _xla_conv3d(x.astype(jnp.float32), k.astype(jnp.float32))
    out = pallas_conv3d.conv3d_3x3x3(x, k, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), rtol=0.05, atol=0.08)


def test_supports_gate():
    assert not pallas_conv3d.supports((1, 7, 7, 4, 64), 64)   # 7 % tiles
    assert not pallas_conv3d.supports((1, 8, 8, 4, 80), 64)   # ragged Cin
    assert not pallas_conv3d.supports((1, 8, 8, 4, 64), 19)   # ragged Cout
    assert not pallas_conv3d.supports((1, 8, 8, 1, 64), 64)   # Z too small
    assert pallas_conv3d.supports((1, 100, 100, 8, 256), 256)
    assert pallas_conv3d.supports((1, 25, 25, 2, 256), 256)


def test_convbn_routing_param_compat(rng, monkeypatch):
    """Params created via the train path (Conv3DZSlab) must drive the
    eval-routed Pallas kernel unchanged (checkpoint-safe routing)."""
    from fbbev_tpu.models import layers

    monkeypatch.setattr(layers, "_PALLAS_CONV3D", True)
    monkeypatch.setenv("FBBEV_FORCE_PALLAS_CONV3D", "interpret")

    x = jnp.asarray(rng.randn(1, 8, 8, 4, 64).astype(np.float32))
    mod = layers.ConvBN(64, 3, padding=1, ndim=3, use_bias=True,
                        dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x, True)
    # param tree written by the TRAIN route (z-slab)
    assert variables["params"]["conv"]["kernel"].shape == (3, 3, 3, 64, 64)

    out_eval = mod.apply(variables, x, False,
                         mutable=False)  # pallas route
    monkeypatch.setattr(layers, "_PALLAS_CONV3D", False)
    out_ref = mod.apply(variables, x, False, mutable=False)  # zslab route
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
