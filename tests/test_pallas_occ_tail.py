"""Fused occupancy-head tail kernel (ops/pallas_occ_tail.py).

Reference semantics: OccHead multi-scale fusion + BN + relu + class conv
(``/root/reference/mmdet3d/models/fbbev/heads/occupancy_head.py:190-212``)
followed by the deployment argmax (``fbocc_trt.py:85-127``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbbev_tpu.models.occ_head import OccHead
from fbbev_tpu.ops.pallas_occ_tail import occ_tail, occ_tail_reference


def _inputs(rng, dtype, B=1, Y=16, X=12, Z=8, C=8, K=19, factors=(1, 2, 4)):
    levels = [jnp.asarray(
        rng.randn(B, Y, X // f, Z, C).astype(np.float32), dtype=dtype)
        for f in factors]
    w = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Y, X, Z, len(factors)).astype(np.float32),
        dtype=dtype), -1)
    a = jnp.asarray(rng.rand(C).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(C).astype(np.float32))
    k2 = jnp.asarray(rng.randn(C, K).astype(np.float32))
    return levels, w, a, b, k2


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_occ_tail_matches_reference(dtype):
    """Kernel (interpret mode) == the op-for-op identical XLA impl."""
    rng = np.random.RandomState(0)
    levels, w, a, b, k2 = _inputs(rng, dtype)
    out = occ_tail(levels, w, a, b, k2, interpret=True)
    ref = occ_tail_reference(levels, w, a, b, k2)
    assert out.dtype == ref.dtype == dtype
    # the only difference is matmul accumulation order (per-band dot vs
    # one whole-volume dot)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-5, atol=1e-6)


def test_occ_head_tail_label_equivalence(monkeypatch):
    """Full OccHead: labels from the fused tail (interpret hook) match
    the default logits+argmax path.  f32 so the only differences are the
    X/Y lerp-order rounding (the tail upsamples Y before X; the default
    chain X before Y -- exact-math equal)."""
    rng = np.random.RandomState(7)
    feats = [jnp.asarray(rng.randn(1, s, s, z, 32).astype(np.float32))
             for s, z in ((40, 8), (20, 4), (10, 2))]
    head = OccHead(in_channels=(32, 32, 32), out_channel=19)
    variables = head.init(jax.random.PRNGKey(0), feats)
    ref_labels = np.asarray(
        head.apply(variables, feats, return_labels=True))
    monkeypatch.setenv("FBBEV_OCC_TAIL", "1")
    monkeypatch.setenv("FBBEV_FORCE_OCC_TAIL", "interpret")
    tail_labels = np.asarray(
        head.apply(variables, feats, return_labels=True))
    assert tail_labels.shape == ref_labels.shape
    agree = (tail_labels == ref_labels).mean()
    assert agree >= 0.999, agree


def test_occ_head_tail_param_tree_unchanged(monkeypatch):
    """Init under the tail path creates the identical param/stat tree
    (the tail binds pred_conv1/bn and pred_conv2 via dummy calls)."""
    rng = np.random.RandomState(3)
    feats = [jnp.asarray(rng.randn(1, s, s, z, 32).astype(np.float32))
             for s, z in ((40, 8), (20, 4), (10, 2))]
    head = OccHead(in_channels=(32, 32, 32), out_channel=19)
    v_ref = head.init(jax.random.PRNGKey(0), feats)
    monkeypatch.setenv("FBBEV_OCC_TAIL", "1")
    monkeypatch.setenv("FBBEV_FORCE_OCC_TAIL", "interpret")
    v_tail = head.init(jax.random.PRNGKey(0), feats, return_labels=True)
    ref_tree = jax.tree.map(lambda x: (x.shape, str(x.dtype)), v_ref)
    tail_tree = jax.tree.map(lambda x: (x.shape, str(x.dtype)), v_tail)
    assert ref_tree == tail_tree
