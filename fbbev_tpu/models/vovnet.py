"""VoVNet (V2, eSE) image backbone -- the large FB-OCC variant backbone
(BASELINE config #4: VoVNet-99 at 512x1408).

Parity reference: ``/root/reference/mmdet3d/models/backbones/vovnet.py``
(VoVNetCP): stem of three 3x3 convs (strides 2,1,2), one-shot-aggregation
(OSA) stages -- ``layer_per_block`` 3x3 convs whose outputs are all
concatenated with the input and reduced by a 1x1 conv -- with effective
squeeze-excitation (eSE) and identity connections on non-first blocks;
max-pool stride 2 between stages.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from fbbev_tpu.models.layers import ConvBN, max_pool_ceil
from fbbev_tpu.registry import BACKBONES

STAGE_SPECS = {
    "V-19-eSE": dict(stem=(64, 64, 128), stage_conv_ch=(128, 160, 192, 224),
                     stage_out_ch=(256, 512, 768, 1024), layer_per_block=3,
                     block_per_stage=(1, 1, 1, 1)),
    "V-39-eSE": dict(stem=(64, 64, 128), stage_conv_ch=(128, 160, 192, 224),
                     stage_out_ch=(256, 512, 768, 1024), layer_per_block=5,
                     block_per_stage=(1, 1, 2, 2)),
    "V-57-eSE": dict(stem=(64, 64, 128), stage_conv_ch=(128, 160, 192, 224),
                     stage_out_ch=(256, 512, 768, 1024), layer_per_block=5,
                     block_per_stage=(1, 1, 4, 3)),
    "V-99-eSE": dict(stem=(64, 64, 128), stage_conv_ch=(128, 160, 192, 224),
                     stage_out_ch=(256, 512, 768, 1024), layer_per_block=5,
                     block_per_stage=(1, 3, 9, 3)),
}


class ESEModule(nn.Module):
    """Effective squeeze-excitation: gap -> 1x1 conv -> hsigmoid -> scale."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype,
                    name="fc")(s)
        return x * jnp.clip(s / 6.0 + 0.5, 0.0, 1.0)  # hard sigmoid


class OSAModule(nn.Module):
    stage_ch: int
    concat_ch: int
    layer_per_block: int
    identity: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity_feat = x
        outputs = [x]
        for i in range(self.layer_per_block):
            x = ConvBN(self.stage_ch, 3, padding=1, dtype=self.dtype,
                       name=f"conv{i}")(x, train)
            outputs.append(x)
        x = jnp.concatenate(outputs, axis=-1)
        x = ConvBN(self.concat_ch, 1, padding=0, dtype=self.dtype,
                   name="concat")(x, train)
        x = ESEModule(self.concat_ch, dtype=self.dtype, name="ese")(x)
        if self.identity:
            x = x + identity_feat
        return x


@BACKBONES.register
class VoVNetCP(nn.Module):
    spec_name: str = "V-99-eSE"
    out_indices: Tuple[int, ...] = (2, 3)  # stage indices 0..3
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = STAGE_SPECS[self.spec_name]
        s1, s2, s3 = spec["stem"]
        x = ConvBN(s1, 3, 2, padding=1, dtype=self.dtype,
                   name="stem1")(x, train)
        x = ConvBN(s2, 3, 1, padding=1, dtype=self.dtype,
                   name="stem2")(x, train)
        x = ConvBN(s3, 3, 2, padding=1, dtype=self.dtype,
                   name="stem3")(x, train)
        outs = []
        osa_cls = OSAModule
        if self.remat:
            osa_cls = nn.remat(OSAModule, static_argnums=(2,))
        for stage in range(4):
            if stage > 0:
                x = max_pool_ceil(x, 3, 2)  # MaxPool2d(3,2,ceil_mode=True), vovnet.py:262
            for b in range(spec["block_per_stage"][stage]):
                x = osa_cls(
                    stage_ch=spec["stage_conv_ch"][stage],
                    concat_ch=spec["stage_out_ch"][stage],
                    layer_per_block=spec["layer_per_block"],
                    identity=b > 0, dtype=self.dtype,
                    name=f"stage{stage + 2}_{b}")(x, train)
            if stage in self.out_indices:
                outs.append(x)
        return outs
