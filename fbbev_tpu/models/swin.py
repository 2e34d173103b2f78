"""Swin Transformer image backbone (zoo alternative,
cf. ``/root/reference/mmdet3d/models/backbones/swin.py``): 4x4 patch embed,
stages of windowed (shifted) multi-head attention blocks with relative
position bias, patch-merging downsampling, LN-ed stage outputs.

Windows are padded to multiples of ``window_size`` (mmcv behaviour); the
shift mask excludes cross-boundary attention in shifted blocks.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fbbev_tpu.registry import BACKBONES

SPECS = {
    "tiny": dict(depths=(2, 2, 6, 2), heads=(3, 6, 12, 24), embed=96),
    "small": dict(depths=(2, 2, 18, 2), heads=(3, 6, 12, 24), embed=96),
    "base": dict(depths=(2, 2, 18, 2), heads=(4, 8, 16, 32), embed=128),
}


def _rel_pos_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + ws - 1
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nW, ws*ws, C); mask: (nW_types, ws*ws, ws*ws) or None."""
        nW, L, C = x.shape
        h = self.heads
        qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(nW, L, 3, h, C // h), 3, axis=2)
        q = q[:, :, 0].transpose(0, 2, 1, 3) * (C // h) ** -0.5
        k = k[:, :, 0].transpose(0, 2, 1, 3)
        v = v[:, :, 0].transpose(0, 2, 1, 3)
        attn = jnp.einsum("whqc,whkc->whqk", q, k).astype(jnp.float32)
        table = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, h))
        idx = jnp.asarray(_rel_pos_index(self.window))
        attn = attn + table[idx].transpose(2, 0, 1)[None]
        if mask is not None:
            attn = attn + mask[:, None]
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("whqk,whkc->whqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nW, L, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C)."""
        B, H, W, C = x.shape
        ws = self.window
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)

        pad_h = (-H) % ws
        pad_w = (-W) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))

        nh, nw = Hp // ws, Wp // ws
        xw = x.reshape(B, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(B * nh * nw, ws * ws, C)

        mask = None
        if self.shift:
            img_mask = np.zeros((Hp, Wp), np.int32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -self.shift),
                       slice(-self.shift, None)):
                for wss in (slice(0, -ws), slice(-ws, -self.shift),
                            slice(-self.shift, None)):
                    img_mask[hs, wss] = cnt
                    cnt += 1
            mw = img_mask.reshape(nh, ws, nw, ws).transpose(0, 2, 1, 3)
            mw = mw.reshape(nh * nw, ws * ws)
            amask = np.where(mw[:, :, None] != mw[:, None, :], -100.0, 0.0)
            mask = jnp.asarray(
                np.tile(amask, (B, 1, 1)).astype(np.float32))

        att = WindowAttention(C, self.heads, ws, dtype=self.dtype,
                              name="attn")(xw, mask)
        x = att.reshape(B, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, Hp, Wp, C)
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = x[:, :H, :W]
        x = shortcut + x

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU is exact erf
        y = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


@BACKBONES.register
class SwinTransformer(nn.Module):
    arch: str = "base"
    window: int = 7
    out_indices: Tuple[int, ...] = (2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = SPECS[self.arch]
        C = spec["embed"]
        x = nn.Conv(C, (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)
        outs = []
        for stage, (depth, heads) in enumerate(
                zip(spec["depths"], spec["heads"])):
            dim = C * 2 ** stage
            if stage > 0:
                # patch merging: 2x2 concat + LN + linear reduce
                B, H, W, Cc = x.shape
                ph, pw = H % 2, W % 2
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
                x = x.reshape(B, (H + ph) // 2, 2, (W + pw) // 2, 2, Cc)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    B, (H + ph) // 2, (W + pw) // 2, 4 * Cc)
                x = nn.LayerNorm(epsilon=1e-5,
                                 name=f"merge{stage}_norm")(x)
                x = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                             name=f"merge{stage}_reduce")(x)
            for b in range(depth):
                x = SwinBlock(
                    dim, heads, window=self.window,
                    shift=0 if b % 2 == 0 else self.window // 2,
                    dtype=self.dtype, name=f"stage{stage}_{b}")(x)
            if stage in self.out_indices:
                outs.append(
                    nn.LayerNorm(epsilon=1e-5, name=f"out_norm{stage}")(x))
        return outs
