"""3D ResNet BEV-voxel encoder backbone.

Parity reference: ``CustomResNet3D``
(``/root/reference/mmdet3d/models/fbbev/modules/resnet3d.py:143-274``);
FB-OCC config: depth 18, strides [1,2,2], planes [64,128,256],
out_indices (0,1,2), SyncBN (dense path; the spconv sparse variant is off
in the shipped config and intentionally not rebuilt -- dense 3D convs map
straight onto the MXU).

Layout: (B, Y, X, Z, C), treated as NDHWC for 3D convolution.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from fbbev_tpu.models.layers import ConvBN
from fbbev_tpu.registry import BACKBONES


class BasicBlock3D(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBN(self.features, 3, self.strides, padding=1, ndim=3,
                   use_bias=True, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(self.features, 3, 1, padding=1, ndim=3, use_bias=True,
                   act=None, dtype=self.dtype, name="conv2")(y, train)
        if self.strides != 1 or residual.shape[-1] != self.features:
            residual = ConvBN(self.features, 1, self.strides, padding=0,
                              ndim=3, use_bias=True, act=None,
                              dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(y + residual)


@BACKBONES.register
class CustomResNet3D(nn.Module):
    block_inplanes: Sequence[int] = (64, 128, 256)
    block_strides: Sequence[int] = (1, 2, 2)
    blocks_per_stage: int = 2  # depth 18
    out_indices: Tuple[int, ...] = (0, 1, 2)
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = BasicBlock3D
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        x = ConvBN(self.block_inplanes[0], 1, 1, padding=0, ndim=3,
                   dtype=self.dtype, name="input_proj")(x, train)
        outs = []
        for stage, (planes, stride) in enumerate(
                zip(self.block_inplanes, self.block_strides)):
            for b in range(self.blocks_per_stage):
                x = block_cls(
                    planes, strides=stride if b == 0 else 1,
                    dtype=self.dtype, name=f"layer{stage}_{b}")(x, train)
            if stage in self.out_indices:
                outs.append(x)
        return outs
