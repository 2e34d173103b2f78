"""DLA (Deep Layer Aggregation) image backbone (zoo alternative,
cf. ``/root/reference/mmdet3d/models/backbones/dla.py``): hierarchical
tree stages of BasicBlocks with root-node aggregation (DLA-34 layout).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from fbbev_tpu.models.layers import BasicBlock2D, ConvBN, max_pool_same
from fbbev_tpu.registry import BACKBONES

SPECS = {
    "dla34": dict(levels=(1, 1, 1, 2, 2, 1),
                  channels=(16, 32, 64, 128, 256, 512)),
}


class Root(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32
    residual: bool = False

    @nn.compact
    def __call__(self, children, train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = ConvBN(self.features, 1, padding=0, act=None, dtype=self.dtype,
                   name="conv")(x, train)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    levels: int
    features: int
    strides: int = 1
    root_residual: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children=None,
                 train: bool = False):
        children = list(children) if children else []
        bottom = (max_pool_same(x, self.strides, self.strides)
                  if self.strides > 1 else x)
        if residual is None:
            residual = bottom
            if bottom.shape[-1] != self.features:
                residual = ConvBN(self.features, 1, padding=0, act=None,
                                  dtype=self.dtype,
                                  name="project")(bottom, train)
        if self.levels == 1:
            x1 = BasicBlock2D(self.features, strides=self.strides,
                              dtype=self.dtype, name="tree1")(x, train)
            # block with external residual: re-add (BasicBlock2D has its
            # own internal shortcut; DLA parity uses the projected one)
            x2 = BasicBlock2D(self.features, dtype=self.dtype,
                              name="tree2")(x1, train)
            return Root(self.features, dtype=self.dtype,
                        residual=self.root_residual,
                        name="root")([x2, x1] + children, train)
        x1 = Tree(self.levels - 1, self.features, strides=self.strides,
                  root_residual=self.root_residual, dtype=self.dtype,
                  name="tree1")(x, None, None, train)
        children.append(x1)
        return Tree(self.levels - 1, self.features,
                    root_residual=self.root_residual, dtype=self.dtype,
                    name="tree2")(x1, None, children, train)


@BACKBONES.register
class DLANet(nn.Module):
    arch: str = "dla34"
    out_indices: Tuple[int, ...] = (4, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = SPECS[self.arch]
        ch = spec["channels"]
        x = ConvBN(ch[0], 7, 1, padding=3, dtype=self.dtype,
                   name="base_layer")(x, train)
        outs = []
        # level 0/1: plain conv stages
        x = ConvBN(ch[0], 3, 1, padding=1, dtype=self.dtype,
                   name="level0")(x, train)
        if 0 in self.out_indices:
            outs.append(x)
        x = ConvBN(ch[1], 3, 2, padding=1, dtype=self.dtype,
                   name="level1")(x, train)
        if 1 in self.out_indices:
            outs.append(x)
        for lvl in range(2, 6):
            x = Tree(spec["levels"][lvl], ch[lvl], strides=2,
                     root_residual=lvl > 2, dtype=self.dtype,
                     name=f"level{lvl}")(x, train=train)
            if lvl in self.out_indices:
                outs.append(x)
        return outs
