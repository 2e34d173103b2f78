"""Feature pyramid necks.

``CustomFPN`` mirrors the reference's single-output FPN over C4/C5
(``/root/reference/mmdet3d/models/necks/fpn.py:12``; config uses
``in_channels=[1024, 2048], out_channels=256, num_outs=1, out_ids=[0]``):
1x1 laterals (no norm/act), nearest top-down add, 3x3 conv on the
requested output levels only.

``FPN_LSS`` mirrors ``/root/reference/mmdet3d/models/necks/lss_fpn.py:11``
(upsample-concat-conv fusion of two levels), used by BEVDet-style variants.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fbbev_tpu.models.layers import ConvBN
from fbbev_tpu.registry import NECKS


def _upsample_nearest(x, out_hw):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, out_hw[0], out_hw[1], C), method="nearest")


@NECKS.register
class CustomFPN(nn.Module):
    in_channels: Sequence[int] = (1024, 2048)
    out_channels: int = 256
    out_ids: Tuple[int, ...] = (0,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name=f"lateral{i}")(inputs[i])
            for i in range(len(inputs))
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest(
                laterals[i], laterals[i - 1].shape[1:3])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=True,
                    dtype=self.dtype, name=f"fpn{i}")(laterals[i])
            for i in self.out_ids
        ]
        return outs


@NECKS.register
class FPN_LSS(nn.Module):
    """Fuse a low-res level into a high-res one: upsample 2x-concat-convs."""

    out_channels: int = 512
    scale_factor: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x_low, x_high = inputs  # high-res first? reference: feats[0], feats[2]
        B, H, W, C = x_high.shape
        up = jax.image.resize(
            x_high,
            (B, H * self.scale_factor, W * self.scale_factor, C),
            method="linear",
        )
        x = jnp.concatenate([x_low, up], axis=-1)
        x = ConvBN(self.out_channels, 3, padding=1, dtype=self.dtype,
                   name="conv1")(x, train)
        x = ConvBN(self.out_channels, 3, padding=1, dtype=self.dtype,
                   name="conv2")(x, train)
        return x
