"""Pallas TPU kernel for fused deformable-attention sampling.

The XLA formulation (``fbbev_tpu.ops.deform_attn.deformable_sample_attend``)
builds bilinear one-hot matrices in HBM between construction and the MXU
matmul -- several GB of round-trip traffic per frame.  This kernel builds
each one-hot tile directly in VMEM, keeps the (tiny) per-camera value
table VMEM-resident, and runs the interpolation matmul + attention
reduction in one fused pass.

Per grid step (camera b, query tile i):
  onehot  (TQ*heads*P, HW)  = sum_corners w_corner * (iota == idx_corner)
  sampled (TQ*heads*P, C)   = onehot @ value[b]          (MXU)
  out     (TQ, C)           = sum over (heads, P) of sampled * head_mask

The bilinear corner indices/weights (with the attention weight folded into
the corner weights) are precomputed in XLA -- they are small (4 ints +
4 floats per sample).

STATUS (round 1, v5e via axon): measured SLOWER than the XLA formulation
(14.5 ms vs 5.6 ms at Q=4096) -- per-grid-step overhead dominates at the
VMEM-feasible tile sizes (tile_q=16; 32 exceeds scoped VMEM).  Kept as
experimental infrastructure; the model uses the XLA path.  Follow-ups:
fold the corner build into fewer VPU temps, multi-tile inner fori_loop to
amortise step overhead, f8 one-hot.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fbbev_tpu.ops.deform_attn import _bilinear_corners


def _kernel(idx_ref, wgt_ref, value_ref, mask_ref, out_ref, *, HW: int,
            n_samples: int, group: int):
    """idx/wgt (n_samples, 4); value (HW, C); mask (group, C);
    out (n_samples // group, C)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n_samples, HW), 1)
    oh = jnp.zeros((n_samples, HW), value_ref.dtype)
    for c in range(4):
        idx = idx_ref[0, :, c][:, None]
        w = wgt_ref[0, :, c][:, None]
        oh = oh + ((iota == idx) * w).astype(value_ref.dtype)
    sampled = jnp.dot(oh, value_ref[0, :, :],
                      preferred_element_type=jnp.float32)
    C = sampled.shape[-1]
    tq = n_samples // group
    sampled = sampled.reshape(tq, group, C)
    out_ref[0, :, :] = jnp.sum(
        sampled * mask_ref[:, :][None].astype(jnp.float32), axis=1
    ).astype(out_ref.dtype)


def pallas_deformable_sample_attend(
        value: jnp.ndarray, spatial_shape: Tuple[int, int],
        loc: jnp.ndarray, attn: jnp.ndarray,
        tile_q: int = 16, interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for
    :func:`fbbev_tpu.ops.deform_attn.deformable_sample_attend`.

    Args:
      value: (B, H*W, heads, head_dim).
      loc: (B, Q, heads, P, 2) in [0, 1].
      attn: (B, Q, heads, P).

    Returns: (B, Q, heads*head_dim) float32.
    """
    B, HW, heads, hd = value.shape
    H, W = spatial_shape
    Q, P = loc.shape[1], loc.shape[3]
    C = heads * hd
    group = heads * P

    pad_q = (-Q) % tile_q
    if pad_q:
        loc = jnp.pad(loc, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0)))
        attn = jnp.pad(attn, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    Qp = Q + pad_q
    n_tiles = Qp // tile_q
    n_samples = tile_q * group

    corners = _bilinear_corners(loc, H, W)
    idx = jnp.stack([c[0] for c in corners], -1).reshape(B, Qp * group, 4)
    wgt = jnp.stack([c[1] for c in corners], -1) * attn[..., None]
    wgt = wgt.reshape(B, Qp * group, 4).astype(jnp.float32)

    head_mask = np.zeros((group, C), np.float32)
    for h in range(heads):
        head_mask[h * P:(h + 1) * P, h * hd:(h + 1) * hd] = 1.0
    head_mask = jnp.asarray(head_mask)

    v = value.reshape(B, HW, C)

    grid = (B, n_tiles)
    out = pl.pallas_call(
        # NOTE: interpret=True makes this runnable on CPU for tests

        functools.partial(_kernel, HW=HW, n_samples=n_samples, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_samples, 4), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_samples, 4), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HW, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_q, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Qp, C), jnp.float32),
        interpret=interpret,
    )(idx, wgt, v, head_mask)
    return out[:, :Q]
