"""ConvNeXt image backbone (zoo alternative,
cf. ``/root/reference/mmdet3d/models/backbones/convnext.py``): patchify
stem, depthwise 7x7 + LN + pointwise MLP (GELU) blocks with layer scale,
LN-ed stage outputs.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from fbbev_tpu.registry import BACKBONES

SPECS = {
    "tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        # exact erf GELU: torch nn.GELU default (flax defaults to tanh approx)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return x + gamma * y


@BACKBONES.register
class ConvNeXt(nn.Module):
    arch: str = "base"
    out_indices: Tuple[int, ...] = (2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = SPECS[self.arch]
        outs = []
        for stage, (depth, dim) in enumerate(
                zip(spec["depths"], spec["dims"])):
            if stage == 0:
                x = nn.Conv(dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                            name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, name=f"down{stage}_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down{stage}_conv")(x)
            for b in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype,
                                  name=f"stage{stage}_{b}")(x)
            if stage in self.out_indices:
                outs.append(
                    nn.LayerNorm(epsilon=1e-6, name=f"out_norm{stage}")(x))
        return outs
