"""Exponential moving average of params + batch stats.

Parity reference: ``MEGVIIEMAHook``
(``/root/reference/mmdet3d/core/hook/ema.py:17-138``): EMA over every
float parameter AND buffer with decay ``0.999 * (1 - exp(-updates/2000))``,
where ``updates`` starts from ``init_updates`` (10560 for the warm-started
FB-OCC recipe).  Evaluation and the released checkpoint use the EMA
weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def megvii_ema_decay(updates, base_decay: float = 0.999,
                     tau: float = 2000.0):
    return base_decay * (1.0 - jnp.exp(-updates / tau))


def ema_update(ema_tree, new_tree, decay):
    """ema <- ema * d + new * (1 - d), elementwise over the pytree."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_tree, new_tree)
