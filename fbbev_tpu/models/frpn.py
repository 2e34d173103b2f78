"""FRPN: BEV foreground mask head (the FB-BEV paper's query-pruning mask;
disabled in the shipped FB-OCC config but part of the FB-BEV surface).

Parity reference: ``/root/reference/mmdet3d/models/fbbev/modules/frpn.py:15-55``:
conv3x3 -> BN -> ReLU -> conv3x3 -> 1 channel; loss = BCE-with-logits
(pos_weight 2.13) + dice.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from fbbev_tpu.models.layers import ConvBN
from fbbev_tpu.registry import HEADS


@HEADS.register
class FRPN(nn.Module):
    in_channels: int = 512
    mask_thre: float = 0.4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, C) BEV feature -> (B, H, W) mask logits."""
        y = ConvBN(self.in_channels // 2, 3, padding=1, dtype=self.dtype,
                   name="conv1")(x, train)
        y = nn.Conv(1, (3, 3), padding=1, use_bias=True, dtype=self.dtype,
                    name="conv2")(y)
        return y[..., 0].astype(jnp.float32)


def bev_mask_loss(gt_mask: jnp.ndarray, logits: jnp.ndarray,
                  pos_weight: float = 2.13):
    """BCE (pos-weighted) + dice loss on the BEV mask (frpn.py:49-55)."""
    gt = gt_mask.astype(jnp.float32)
    logits = logits.astype(jnp.float32)
    # torch BCEWithLogitsLoss(pos_weight=w): mean over all elements of
    #   w*y*softplus(-x) + (1-y)*softplus(x)
    ce = pos_weight * gt * jax.nn.softplus(-logits) + \
        (1.0 - gt) * jax.nn.softplus(logits)
    mask_ce_loss = jnp.mean(ce)
    p = jax.nn.sigmoid(logits).reshape(logits.shape[0], -1)
    g = gt.reshape(gt.shape[0], -1)
    eps = 1e-5
    dice = 1.0 - (2.0 * jnp.sum(p * g, -1) + eps) / (
        jnp.sum(p, -1) + jnp.sum(g, -1) + eps)
    return {"mask_ce_loss": mask_ce_loss,
            "mask_dice_loss": jnp.mean(dice)}
