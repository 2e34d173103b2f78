"""Pallas TPU kernel: fused deformable-attention sampling.

Replaces the XLA one-hot-matmul scan paths in :mod:`ops.deform_attn`
(``bilinear_sample_onehot`` / ``deformable_sample_attend``) for the hot
backward-projection stage.  Functional spec: mmcv's
``multi_scale_deformable_attn_pytorch`` (referenced by the reference at
``spatial_cross_attention_depth.py:7,597``): zero-padded bilinear sampling
of a flattened (H*W, C) value map followed by the attention-weighted sum
over points, per head.

Why a kernel: the XLA formulation materialises the (rows, H*W) one-hot
interpolation matrix through HBM (~2 GB per frame at flagship shapes,
measured as the dominant cost of the backward projection: while.6/.16 +
dynamic-update-slice fusions ~14 ms of the 15.1 ms stage).  Here the
one-hot lives only in VMEM and is consumed by the MXU immediately.

Formulation: for flattened table index i = iy*W + ix and sample row r at
pixel coords (x_r, y_r),

    oh[r, i] = tent(x_r - ix) * tent(y_r - iy) * w_r,
    tent(d)  = max(0, 1 - |d|)

which reproduces all four bilinear corner weights at once and gives
``padding_mode='zeros'`` semantics for free (out-of-map samples overlap no
cell).  The attention weight ``w_r`` is folded into the interpolation row,
so sampling + weighting is a single (rows, H*W) @ (H*W, C) matmul; the
per-head channel selection is a static mask applied in the (Q, K, C) ->
(Q, C) reduction, all in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(v_ref, xs_ref, ys_ref, w_ref, o_ref, *, H, Wp, TQ, K, C,
            heads, hd):
    R = TQ * K
    # coord blocks are (1, 1, 1, R): sample rows live in LANES, so the
    # caller-side prep is a free contiguous reshape (the earlier
    # rows-in-sublanes layout forced ~1.3 ms/array of 128x-padded HBM
    # relayout, docs/PERF.md).  The one-hot is built TRANSPOSED (HW, R)
    # and contracted over its leading (sublane) dim -- the MXU's
    # preferred lhs-transposed form -- so nothing ever relayouts.
    xs = xs_ref[0, 0, 0]  # (1, R)
    ys = ys_ref[0, 0, 0]
    wr = w_ref[0, 0, 0]

    # padded columns x >= W never overlap a sample's tent -> zeros
    i = lax.broadcasted_iota(jnp.int32, (H * Wp, 1), 0)
    ix = (i % Wp).astype(jnp.float32)
    iy = (i // Wp).astype(jnp.float32)

    ohT = (jnp.maximum(1.0 - jnp.abs(xs - ix), 0.0)
           * jnp.maximum(1.0 - jnp.abs(ys - iy), 0.0)
           * wr)  # (HW, R)
    v = v_ref[0]
    sampled = lax.dot_general(
        ohT.astype(v.dtype), v, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (R, C)

    if K == 1:
        o_ref[0, 0] = sampled
    else:
        # static head mask: row k = h*P + p selects channels of head h
        kk = lax.broadcasted_iota(jnp.int32, (K, C), 0)
        cc = lax.broadcasted_iota(jnp.int32, (K, C), 1)
        P = K // heads
        mask = ((cc // hd) == (kk // P)).astype(jnp.float32)
        red = (sampled.reshape(TQ, K, C) * mask[None]).sum(axis=1)
        o_ref[0, 0] = red


def _tile_rows(Q: int, K: int) -> int:
    TQ = max(1, min(Q, 2048 // K))
    while Q % TQ:
        TQ -= 1
    return TQ


def supports(spatial_shape, C: int, Q: int, K: int,
             value_itemsize: int = 2,
             vmem_limit_bytes: int = 24 * 1024 * 1024) -> bool:
    """Shape gate: does the per-program VMEM working set fit?

    Mirrors :func:`_attend`'s blocking.  The dominant term is the
    transposed one-hot (H*Wp, TQ*K) f32; a config with a larger feature
    level / channel count must fall back to the XLA scan path instead of
    failing Mosaic compilation at runtime (cf. ops/pallas_warp.supports).
    """
    H, W = spatial_shape
    Wp = W + (-W) % 8
    HWp = H * Wp
    TQ = _tile_rows(Q, K)
    R = TQ * K
    vmem = (HWp * C * value_itemsize   # value map block
            + HWp * R * 4              # transposed one-hot (f32)
            + 3 * R * 4                # coord rows
            + R * C * 4                # sampled (R, C) f32
            + (K * C * 8 if K > 1 else 0)  # head mask + reduce temps
            + TQ * C * 4)              # output block
    return vmem <= vmem_limit_bytes


@functools.partial(jax.jit,
                   static_argnames=("spatial_shape", "heads", "interpret"))
def _attend(value, spatial_shape, xs, ys, w, heads: int,
            interpret: bool = False):
    """value (B, H*W, C); xs/ys/w (B, Q, K) pixel coords + folded weights.
    Returns (B, Q, C) f32."""
    B, HW, C = value.shape
    H, W = spatial_shape
    # pad the map width to a lane-friendly multiple of 8; tents never
    # overlap the zero-padded columns (sample x stays within [-1, W])
    Wp = W + (-W) % 8
    if Wp != W:
        value = jnp.pad(value.reshape(B, H, W, C),
                        ((0, 0), (0, 0), (0, Wp - W), (0, 0)))
        value = value.reshape(B, H * Wp, C)
        HW = H * Wp
    Q, K = xs.shape[1], xs.shape[2]
    hd = C // heads
    # rows per program ~2048 keeps the VMEM one-hot ~<=6 MB for HW<=1024
    TQ = max(1, min(Q, 2048 // K))
    while Q % TQ:
        TQ -= 1
    R = TQ * K

    flat = lambda a: a.reshape(B, Q // TQ, 1, R)  # noqa: E731
    grid = (B, Q // TQ)
    coord_spec = pl.BlockSpec((1, 1, 1, R), lambda b, q: (b, q, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, H=H, Wp=Wp, TQ=TQ, K=K, C=C,
                          heads=heads, hd=hd),
        out_shape=jax.ShapeDtypeStruct((B, Q // TQ, TQ, C), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            coord_spec, coord_spec, coord_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, TQ, C), lambda b, q: (b, q, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Q * K * HW * C,
            bytes_accessed=B * (Q // TQ) * HW * C * value.dtype.itemsize
            + 3 * B * Q * K * 4 + B * Q * C * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(value, flat(xs), flat(ys), flat(w))
    return out.reshape(B, Q, C)


def deformable_sample_attend_pallas(value, spatial_shape, loc, attn,
                                    interpret: bool = False):
    """Drop-in for :func:`ops.deform_attn.deformable_sample_attend`.

    Args: value (B, H*W, heads, hd); loc (B, Q, heads, P, 2) in [0, 1];
    attn (B, Q, heads, P).  Returns (B, Q, heads*hd) f32.
    """
    B, HW, heads, hd = value.shape
    H, W = spatial_shape
    Q, P = loc.shape[1], loc.shape[3]
    C = heads * hd
    x = loc[..., 0].astype(jnp.float32) * W - 0.5   # (B, Q, heads, P)
    y = loc[..., 1].astype(jnp.float32) * H - 0.5
    K = heads * P
    return _attend(value.reshape(B, HW, C), (H, W),
                   x.reshape(B, Q, K), y.reshape(B, Q, K),
                   attn.astype(jnp.float32).reshape(B, Q, K),
                   heads, interpret=interpret)


def bilinear_sample_pallas(value, spatial_shape, loc,
                           interpret: bool = False):
    """Drop-in for :func:`ops.deform_attn.bilinear_sample_onehot`:
    value (B, H*W, C), loc (B, S, 2) in [0, 1] -> (B, S, C) f32."""
    B, HW, C = value.shape
    H, W = spatial_shape
    S = loc.shape[1]
    x = loc[..., 0].astype(jnp.float32) * W - 0.5
    y = loc[..., 1].astype(jnp.float32) * H - 0.5
    ones = jnp.ones_like(x)
    return _attend(value, (H, W), x[..., None], y[..., None],
                   ones[..., None], heads=1, interpret=interpret)
