"""Torchvision-style ResNet image backbone (channels-last, flax).

Used as ``img_backbone`` with depth=50, out stages (2, 3) -> C4/C5 at
strides 16/32 (config ``fbocc-r50-cbgs_depth_16f_16x4_20e.py:119-129``).
Activation rematerialisation (the reference's ``with_cp``) is provided by
``jax.checkpoint`` over each stage when ``remat=True``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from fbbev_tpu.models.layers import (
    BasicBlock2D, Bottleneck2D, ConvBN, max_pool_same,
)
from fbbev_tpu.registry import BACKBONES

_STAGE_BLOCKS = {
    # depth 10 = one BasicBlock per stage: the smallest config that still
    # exercises the full stem/stage/stride structure (used by the
    # multichip dryrun to keep the single-core XLA:CPU compile small)
    10: (BasicBlock2D, (1, 1, 1, 1)),
    18: (BasicBlock2D, (2, 2, 2, 2)),
    34: (BasicBlock2D, (3, 4, 6, 3)),
    50: (Bottleneck2D, (3, 4, 6, 3)),
    101: (Bottleneck2D, (3, 4, 23, 3)),
}


@BACKBONES.register
class ResNet(nn.Module):
    """ResNet-{18,34,50,101} backbone.

    Returns features of the stages listed in ``out_indices``
    (0 -> stride 4 ... 3 -> stride 32).
    """

    depth: int = 50
    out_indices: Tuple[int, ...] = (2, 3)
    stem_features: int = 64
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, blocks = _STAGE_BLOCKS[self.depth]
        if self.remat:
            # static_argnums: (self, x, train) -> train is static
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        x = ConvBN(self.stem_features, 7, 2, padding=3, dtype=self.dtype,
                   name="stem")(x, train)
        x = max_pool_same(x, 3, 2)
        outs = []
        planes = self.stem_features
        for stage, n_blocks in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = block_cls(
                    planes, strides=stride if b == 0 else 1,
                    dtype=self.dtype, name=f"layer{stage + 1}_{b}")(x, train)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return outs


@BACKBONES.register
class CustomResNet(nn.Module):
    """Lightweight BEVDet-style 2D BEV encoder backbone
    (cf. ``/root/reference/mmdet3d/models/backbones/resnet.py:11``):
    plain stacked BasicBlocks over the (z-collapsed) BEV plane.  Used by
    FB-BEV detection variants that keep a 2D BEV representation.
    """

    num_channels: Sequence[int] = (160, 320, 640)
    num_layer: Sequence[int] = (2, 2, 2)
    strides: Sequence[int] = (2, 2, 2)
    out_indices: Tuple[int, ...] = (0, 1, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for stage, (ch, n, s) in enumerate(
                zip(self.num_channels, self.num_layer, self.strides)):
            for b in range(n):
                x = BasicBlock2D(
                    ch, strides=s if b == 0 else 1, dtype=self.dtype,
                    name=f"stage{stage}_{b}")(x, train)
            if stage in self.out_indices:
                outs.append(x)
        return outs
