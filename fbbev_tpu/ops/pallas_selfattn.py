"""Pallas TPU kernel: locality-tiled BEV deformable SELF-attention.

Replaces :func:`ops.deform_attn.deformable_sample_attend_grid_tiled` on
the eval/serving path.  Functional spec is the same as the cross-attn
kernel (mmcv ``multi_scale_deformable_attn_pytorch``, referenced by the
reference at ``spatial_cross_attention_depth.py:7,597`` and used by its
BEV self-attention through ``bevformer_encoder.py``): zero-padded
bilinear sampling of the (H*W, C) BEV table followed by the
attention-weighted sum over points per head — with the BEVFormer
locality contract that query (qy, qx) samples near its own cell.

Why a kernel: the XLA grid-tiled formulation (deform_attn.py:209) must
materialise per-tile source slabs through HBM (a ~64x blow-up of the
BEV table at tile=4/slab=32: ~100 MB/frame) plus the (T, S, SL) one-hot
rows consumed by its einsum; together ~3 ms of the serving step
(docs/PERF.md round-5).  Here the WHOLE (H, Wp, C) BEV table is VMEM
resident (~1.7 MB at the flagship 100x100x80), each grid step slices
its tile's slab directly from it, and the tent-product one-hot
(:mod:`ops.pallas_sample` formulation) is built in VMEM and consumed by
the MXU immediately — nothing but coords and the (Q, C) output crosses
HBM.

Tent formulation (zero-pad semantics for free, all 4 corners at once):

    ohT[v, s] = tent(x_s - ivx(v)) * tent(y_s - ivy(v)) * w_s
    tent(d)   = max(0, 1 - |d|)

built TRANSPOSED (SL, S) with sample rows in lanes, contracted over the
leading (sublane) dim — the MXU's preferred lhs-transposed form.

Correctness domain: like the XLA grid-tiled path, samples must stay
within the slab around their tile (margins >= ~9 cells y / ~7 cells x
after the Mosaic alignment round-down of slab origins; BEVFormer
offsets init <= 2 cells).  Within that domain the result equals the
global one-hot path exactly (f32 values; bf16 values quantise the tent
rows to bf16 exactly like the XLA paths do).  Out-of-GRID samples get
zero-pad semantics from the tents themselves; the only divergence from
the grid-tiled XLA path is beyond the margin contract, where that path
clamps to the slab edge and this one drops the tap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# slab sizes around a (tile x tile) query block.  X origins must be
# 8-aligned and Y origins 2-aligned (Mosaic tiles the last two memref
# dims; cf. ops/pallas_fuse_warp.py tiling note), so the guaranteed
# margins after align-down are y: (SY - tile)/2 - 1, x: (SX - tile)/2 - 7.
SLAB_Y = 24
SLAB_X = 32


def _origins(i, j, *, tile, H, Wp):
    """Aligned slab origin for tile (i, j): clip into the array, then
    align DOWN (last, so divisibility is provable for Mosaic and the
    upper clip bound — itself aligned since H and Wp are — still holds)."""
    oy = jnp.clip(i * tile + tile // 2 - SLAB_Y // 2, 0, H - SLAB_Y)
    oy = (oy // 2) * 2
    ox = jnp.clip(j * tile + tile // 2 - SLAB_X // 2, 0, Wp - SLAB_X)
    ox = (ox // 8) * 8
    return oy, ox


def _kernel(xs_ref, ys_ref, w_ref, v_ref, o_ref, *,
            tile, H, Wp, K, C, heads, hd):
    i = pl.program_id(1)
    j = pl.program_id(2)
    oy, ox = _origins(i, j, tile=tile, H=H, Wp=Wp)

    n_out = tile * tile
    S = n_out * K
    SL = SLAB_Y * SLAB_X

    xs = xs_ref[0, 0, 0]  # (1, S) sample rows in LANES (free reshape)
    ys = ys_ref[0, 0, 0]
    wr = w_ref[0, 0, 0]

    # global source-cell coords of every slab entry
    v = lax.broadcasted_iota(jnp.int32, (SL, 1), 0)
    ivx = ((v % SLAB_X) + ox).astype(jnp.float32)
    ivy = ((v // SLAB_X) + oy).astype(jnp.float32)

    ohT = (jnp.maximum(1.0 - jnp.abs(xs - ivx), 0.0)
           * jnp.maximum(1.0 - jnp.abs(ys - ivy), 0.0)
           * wr)  # (SL, S)

    slab = v_ref[0, pl.ds(oy, SLAB_Y), pl.ds(ox, SLAB_X), :]
    slab = slab.reshape(SL, C)  # SLAB_X % 8 == 0: sublane-merge, no copy
    sampled = lax.dot_general(
        ohT.astype(slab.dtype), slab, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (S, C)

    # static head mask: sample row k = h*P + p selects channels of head h
    kk = lax.broadcasted_iota(jnp.int32, (K, C), 0)
    cc = lax.broadcasted_iota(jnp.int32, (K, C), 1)
    P = K // heads
    mask = ((cc // hd) == (kk // P)).astype(jnp.float32)
    o_ref[0, 0] = (sampled.reshape(n_out, K, C) * mask[None]).sum(axis=1)


def supports(spatial_shape, C: int, Q: int, K: int, tile: int = 4,
             value_itemsize: int = 2,
             vmem_limit_bytes: int = 12 * 1024 * 1024) -> bool:
    """Shape gate mirroring the kernel's VMEM working set (resident value
    table + double-buffered one-hot); oversized configs fall back to the
    XLA grid-tiled path instead of failing Mosaic compilation."""
    H, W = spatial_shape
    if Q != H * W or H % tile or W % tile:
        return False
    if H < SLAB_Y or W < SLAB_X - 7:
        return False
    Wp = _padded_w(W)
    S = tile * tile * K
    SL = SLAB_Y * SLAB_X
    vmem = (H * Wp * C * value_itemsize       # resident value table
            + 2 * SL * S * value_itemsize     # one-hot (double-buffered)
            + 3 * 2 * S * 4                   # coord rows
            + S * C * 4 + K * C * 4           # sampled + head mask
            + 2 * tile * tile * C * 4)        # output blocks
    return vmem <= vmem_limit_bytes


def _padded_w(W: int) -> int:
    """Pad W up to a multiple of 8 so the origin clip bound Wp - SLAB_X
    is itself 8-aligned: the rightmost tiles then clamp to it and their
    slabs cover cells up to Wp - 1 >= W - 1 (the pad columns are zeros,
    which tents treat as the zero-pad exterior)."""
    return (W + 7) // 8 * 8


@functools.partial(jax.jit,
                   static_argnames=("spatial_shape", "heads", "tile",
                                    "interpret"))
def _attend_tiled(value, spatial_shape, xs, ys, w, heads: int,
                  tile: int = 4, interpret: bool = False):
    """value (B, H*W, C); xs/ys/w (B, Q, K) global pixel coords + folded
    attention weights, Q == H*W.  Returns (B, Q, C) f32."""
    B, HW, C = value.shape
    H, W = spatial_shape
    Q, K = xs.shape[1], xs.shape[2]
    hd = C // heads
    Ht, Wt = H // tile, W // tile
    T = Ht * Wt
    n_out = tile * tile
    S = n_out * K

    Wp = _padded_w(W)
    v2 = value.reshape(B, H, W, C)
    if Wp != W:
        # tents never overlap the zero-padded columns for in-grid samples
        v2 = jnp.pad(v2, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))

    def to_tiles(a):
        a = a.reshape(B, Ht, tile, Wt, tile * K)
        a = jnp.moveaxis(a, 3, 2)
        return a.reshape(B, T, 1, S)

    coord_spec = pl.BlockSpec(
        (1, 1, 1, S), lambda b, i, j, Wt=Wt: (b, i * Wt + j, 0, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, H=H, Wp=Wp, K=K, C=C,
                          heads=heads, hd=hd),
        out_shape=jax.ShapeDtypeStruct((B, T, n_out, C), jnp.float32),
        grid=(B, Ht, Wt),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, H, Wp, C), lambda b, i, j: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, n_out, C), lambda b, i, j, Wt=Wt: (b, i * Wt + j, 0, 0),
            memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * S * SLAB_Y * SLAB_X * C,
            bytes_accessed=B * H * Wp * C * value.dtype.itemsize
            + 3 * B * Q * K * 4 + B * Q * C * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(to_tiles(xs), to_tiles(ys), to_tiles(w), v2)
    # untile (B, T, n_out, C) -> row-major queries
    out = out.reshape(B, Ht, Wt, tile, tile, C)
    out = jnp.moveaxis(out, 2, 3).reshape(B, Q, C)
    return out


def deformable_self_attend_pallas(value, spatial_shape, loc, attn,
                                  tile: int = 4, interpret: bool = False):
    """Drop-in for
    :func:`ops.deform_attn.deformable_sample_attend_grid_tiled`.

    Args: value (B, H*W, heads, hd) with H*W == Q; loc (B, Q, heads, P, 2)
    in [0, 1]; attn (B, Q, heads, P).  Returns (B, Q, heads*hd) f32.
    """
    B, HW, heads, hd = value.shape
    H, W = spatial_shape
    Q, P = loc.shape[1], loc.shape[3]
    C = heads * hd
    K = heads * P
    x = loc[..., 0].astype(jnp.float32) * W - 0.5
    y = loc[..., 1].astype(jnp.float32) * H - 0.5
    return _attend_tiled(value.reshape(B, HW, C), (H, W),
                         x.reshape(B, Q, K), y.reshape(B, Q, K),
                         attn.astype(jnp.float32).reshape(B, Q, K),
                         heads, tile=tile, interpret=interpret)
