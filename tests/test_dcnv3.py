import jax.numpy as jnp
import numpy as np

from fbbev_tpu.ops.dcnv3 import dcnv3_core


def test_dcnv3_zero_offset_uniform_mask_is_box_filter(rng):
    """With zero offsets and a uniform (softmaxed) mask, DCNv3 reduces to a
    3x3 zero-padded box filter per channel."""
    B, H, W, C, G = 1, 6, 7, 8, 2
    K = 9
    x = rng.randn(B, H, W, C).astype(np.float32)
    offset = np.zeros((B, H, W, G * K * 2), np.float32)
    mask = np.full((B, H, W, G * K), 1.0 / K, np.float32)
    out = np.asarray(dcnv3_core(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), groups=G))
    pad = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            ref += pad[:, dy:dy + H, dx:dx + W]
    ref /= K
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_dcnv3_integer_offset_shifts_samples(rng):
    """A constant (+1, 0) pixel offset makes every sample read one column
    to the right (equivalent to shifting the input left)."""
    B, H, W, C, G, K = 1, 6, 8, 4, 1, 9
    x = rng.randn(B, H, W, C).astype(np.float32)
    offset = np.zeros((B, H, W, G * K * 2), np.float32)
    offset[..., 0::2] = 1.0  # x-offsets
    mask = np.zeros((B, H, W, G * K), np.float32)
    mask[..., 4] = 1.0  # centre point only
    out = np.asarray(dcnv3_core(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), groups=G))
    # centre sample + 1px right == x shifted left by one (zeros at the edge)
    ref = np.concatenate([x[:, :, 1:], np.zeros((B, H, 1, C))], axis=2)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_dcnv3_mask_weighting(rng):
    B, H, W, C, G, K = 1, 5, 5, 2, 1, 9
    x = rng.randn(B, H, W, C).astype(np.float32)
    offset = np.zeros((B, H, W, G * K * 2), np.float32)
    mask = np.zeros((B, H, W, G * K), np.float32)
    mask[..., 4] = 0.5  # half the centre value
    out = np.asarray(dcnv3_core(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), groups=G))
    np.testing.assert_allclose(out, 0.5 * x, atol=1e-5)
