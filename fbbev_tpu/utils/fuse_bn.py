"""Inference-time Conv+BN folding.

Equivalent of the reference's ``tools/misc/fuse_conv_bn.py`` /
``--fuse-conv-bn`` test option: every ``ConvBN``-style subtree
(``{conv: {kernel[, bias]}, bn: {scale, bias}}`` in params plus
``{bn: {mean, var}}`` in batch stats) is folded into a single conv with

    k' = k * scale / sqrt(var + eps)
    b' = (b - mean) * scale / sqrt(var + eps) + bias

After folding, the batch-stats tree entries become identity statistics
(mean 0, var 1, scale 1, bias 0), so the same model definition runs
unchanged -- XLA then folds the no-op normalisation away.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np


def fold_batch_norms(variables: Dict[str, Any],
                     eps: float = 1e-5) -> Dict[str, Any]:
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    def walk(p: Dict[str, Any], s: Dict[str, Any]):
        if not isinstance(p, dict):
            return
        if ("conv" in p and "bn" in p and isinstance(s, dict)
                and "bn" in s and "kernel" in p.get("conv", {})):
            k = p["conv"]["kernel"]
            scale = p["bn"]["scale"]
            bias = p["bn"]["bias"]
            mean = s["bn"]["mean"]
            var = s["bn"]["var"]
            factor = scale / np.sqrt(var + eps)
            p["conv"]["kernel"] = (k * factor).astype(k.dtype)
            if "bias" in p["conv"]:
                p["conv"]["bias"] = (p["conv"]["bias"] * factor).astype(
                    k.dtype)
            # the remaining BN becomes the identity + folded bias (the
            # param tree keeps its structure so apply() works unchanged)
            p["bn"]["scale"] = np.ones_like(scale)
            p["bn"]["bias"] = (bias - mean * factor).astype(bias.dtype)
            s["bn"]["mean"] = np.zeros_like(mean)
            s["bn"]["var"] = np.ones_like(var) - eps
        for key, sub in p.items():
            if isinstance(sub, dict):
                walk(sub, s.get(key, {}) if isinstance(s, dict) else {})

    walk(params, stats)
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out
