"""DLA (Deep Layer Aggregation) image backbone (zoo alternative).

Exact structural parity with the reference DLANet
(``/root/reference/mmdet3d/models/backbones/dla.py:39-430``, DLA-34):
7x7 base layer, two plain conv levels, then Tree levels 2-5 with
``layer_with_level_root=(False, True, True, True)`` — a level-root tree
appends its (max-pooled) input to the root concat.  Blocks take an
EXTERNAL identity (the tree's projected bottom), exactly like the
reference's ``BasicBlock.forward(x, identity)``; the root conv consumes
``concat([x2, x1, *children])``.  Param layout maps 1:1 onto the
reference names via ``train/checkpoint_convert.convert_dla_backbone``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from fbbev_tpu.models.layers import ConvBN, max_pool_same
from fbbev_tpu.registry import BACKBONES

SPECS = {
    "dla34": dict(levels=(1, 1, 1, 2, 2, 1),
                  channels=(16, 32, 64, 128, 256, 512),
                  level_roots=(False, True, True, True)),
}


class DLABasicBlock(nn.Module):
    """Reference ``BasicBlock`` (``dla.py:39-101``): two 3x3 convs, the
    residual is the EXTERNAL identity supplied by the enclosing tree."""

    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, identity, train: bool = False):
        y = ConvBN(self.features, 3, self.strides, padding=1,
                   dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(self.features, 3, 1, padding=1, act=None,
                   dtype=self.dtype, name="conv2")(y, train)
        return nn.relu(y + identity)


class Root(nn.Module):
    """Reference ``Root`` (``dla.py:103-156``): 1x1 conv over the concat
    of the aggregated features (+ optional identity of the first)."""

    features: int
    add_identity: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, children, train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = ConvBN(self.features, 1, padding=0, act=None, dtype=self.dtype,
                   name="conv")(x, train)
        if self.add_identity:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Reference ``Tree`` (``dla.py:157-277``)."""

    levels: int
    features: int
    strides: int = 1
    level_root: bool = False
    add_identity: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, children=None, train: bool = False):
        children = [] if children is None else list(children)
        bottom = (max_pool_same(x, self.strides, self.strides)
                  if self.strides > 1 else x)
        if x.shape[-1] != self.features:
            identity = ConvBN(self.features, 1, padding=0, act=None,
                              dtype=self.dtype, name="project")(bottom,
                                                                train)
        else:
            identity = bottom
        if self.level_root:
            children.append(bottom)
        if self.levels == 1:
            x1 = DLABasicBlock(self.features, self.strides,
                               dtype=self.dtype, name="tree1")(x, identity,
                                                               train)
            x2 = DLABasicBlock(self.features, 1, dtype=self.dtype,
                               name="tree2")(x1, x1, train)
            return Root(self.features, add_identity=self.add_identity,
                        dtype=self.dtype,
                        name="root")([x2, x1] + children, train)
        x1 = Tree(self.levels - 1, self.features, strides=self.strides,
                  add_identity=self.add_identity, dtype=self.dtype,
                  name="tree1")(x, None, train)
        children.append(x1)
        return Tree(self.levels - 1, self.features,
                    add_identity=self.add_identity, dtype=self.dtype,
                    name="tree2")(x1, children, train)


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
        # level 0/1: plain conv stages (_make_conv_level, dla.py:384-419;
        # dla34 has one conv per level)
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
                     level_root=spec["level_roots"][lvl - 2],
                     dtype=self.dtype, name=f"level{lvl}")(x, train=train)
            if lvl in self.out_indices:
                outs.append(x)
        return outs
