"""3D FPN over voxel features.

Parity reference: ``FPN3D``
(``/root/reference/mmdet3d/models/fbbev/modules/fpn3d.py:14-110``):
1x1x1 lateral ConvModule (conv-BN-ReLU, bias=False), trilinear top-down
(align_corners=False), 3x3x3 output ConvModule per level.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from fbbev_tpu.models.layers import ConvBN, resize_trilinear
from fbbev_tpu.registry import NECKS


@NECKS.register
class FPN3D(nn.Module):
    in_channels: Sequence[int] = (64, 128, 256)
    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        assert len(inputs) == len(self.in_channels)
        laterals = [
            ConvBN(self.out_channels, 1, padding=0, ndim=3,
                   dtype=self.dtype, name=f"lateral{i}")(inputs[i], train)
            for i in range(len(inputs))
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = resize_trilinear(
                laterals[i], laterals[i - 1].shape[1:4],
                align_corners=False)
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            ConvBN(self.out_channels, 3, padding=1, ndim=3,
                   dtype=self.dtype, name=f"fpn{i}")(laterals[i], train)
            for i in range(len(laterals))
        ]
        return outs
