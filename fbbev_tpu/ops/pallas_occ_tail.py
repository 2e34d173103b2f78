"""Pallas TPU kernel: fused occupancy-head tail for the serving path.

Reference semantics: the OccHead tail
(``/root/reference/mmdet3d/models/fbbev/heads/occupancy_head.py:190-212``):
multi-scale trilinear upsample (align_corners=False) + per-voxel softmax
blend, BatchNorm, relu, the final 1x1x1 class conv -- followed by the
deployment argmax (the serving pipeline emits labels,
``fbocc_trt.py:85-127`` / serving.py:129).

Why a kernel (docs/PERF.md round-5): the XLA tail pays ~3 ms of
stack/interleave relayouts in the full-resolution upsample chain plus
full-res HBM round-trips for the blended volume and the f32 logits --
~4.5 ms for what is ~190 MB of unavoidable traffic (~0.25 ms at HBM
bandwidth).  Here each output row-band is built entirely in VMEM: the
X-axis 2-tap lerp, the n-level blend, the (folded) BN affine, relu and
the (C -> classes) MXU contraction happen per band; only the coarse
inputs and the per-band class logits touch HBM.

Division of labour with XLA (Mosaic constraints, docs/ROUND4.md: the
z-interleave of a non-lane-full array is an unsupported shape cast):

  * Z upsample: OUTSIDE, at coarse X (sublane interleave, but on the
    smallest volumes);
  * Y upsample: OUTSIDE (leading-axis interleave is a cheap reshape, and
    pre-expanding Y makes every output row-band map to an aligned input
    band -- no halo);
  * X upsample: INSIDE the kernel.  The phase stack+merge only touches a
    leading dim of the in-kernel (TY, X, Z, C) block, which Mosaic
    supports at any C;
  * argmax: OUTSIDE.  The kernel emits flat (rows, classes) logits --
    writing labels would need a (rows, 1) -> (TY, X, Z) relayout; the
    XLA argmax over the tiny class dim costs ~0.04 ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _upsample_x(v, s: int):
    """Exact integer-factor 2-tap lerp along axis 1 of (TY, X, Z, C) --
    the same math (and dtype behaviour: python-float weights keep the
    array dtype) as ``models.layers._upsample_int_axis(x, axis, s)``."""
    if s == 1:
        return v
    n = v.shape[1]
    first = v[:, :1]
    last = v[:, n - 1:]
    prev = jnp.concatenate([first, v[:, :n - 1]], axis=1)
    nxt = jnp.concatenate([v[:, 1:], last], axis=1)
    phases = []
    for k in range(s):
        c = (k + 0.5) / s - 0.5
        if c < 0:
            w = c + 1.0
            phases.append((1.0 - w) * prev + w * v)
        else:
            w = c
            phases.append((1.0 - w) * v + w * nxt)
    out = jnp.stack(phases, axis=2)  # (TY, X, s, Z, C): leading dims only
    return out.reshape(v.shape[0], n * s, v.shape[2], v.shape[3])


def _kernel(*refs, factors, n_lvl):
    lvl_refs = refs[:n_lvl]
    w_ref, a_ref, b_ref, k2_ref, o_ref = refs[n_lvl:]
    cdt = lvl_refs[0].dtype
    acc = None
    for i in range(n_lvl):
        v = _upsample_x(lvl_refs[i][0], factors[i])  # (TY, X, Z, C)
        t = v * w_ref[0][..., i:i + 1]
        acc = t if acc is None else acc + t
    # (folded) BN affine + relu, in the blend dtype like the XLA path
    # ((1, C) blocks broadcast against (..., Z, C))
    h = jnp.maximum(acc * a_ref[...].astype(cdt) + b_ref[...].astype(cdt),
                    0)
    TY, X, Z, C = h.shape
    # collapse leading dims into sublanes (Z stays tile-aligned) for the
    # MXU contraction; mimic the XLA einsum's dtype (bf16 x bf16 -> f32
    # accumulate -> bf16 out, occ_head pred_conv2 / layers.Conv1x1x1Dense)
    h2 = h.reshape(TY * X * Z, C)
    logits = jnp.dot(h2, k2_ref[...].astype(cdt),
                     preferred_element_type=jnp.float32)
    o_ref[0] = logits.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def occ_tail(levels, w, a, b, k2, interpret=None):
    """Fused multi-scale blend + BN affine + relu + class matmul.

    Args:
      levels: list of (B, Y, X_i, Z, C) arrays, ALREADY upsampled along
        Y and Z to the finest level's Y / Z (``_upsample_int_axis`` on
        axes 3 then 1); X_i must divide the finest X with an integer
        factor.
      w: (B, Y, X, Z, n_lvl) blend weights (finest resolution).
      a, b: (C,) BatchNorm eval affine: ``a = scale * rsqrt(var + eps)``,
        ``b = bias - mean * a`` (identity-folded after fuse_bn).
      k2: (C, K) final class-conv kernel.

    Returns: (B, Y, X, Z, K) logits, dtype of levels[0] (cast to f32 +
      argmax by the caller, matching the XLA tail).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Y, X, Z, C = levels[0].shape
    K = k2.shape[-1]
    n_lvl = len(levels)
    assert w.shape == (B, Y, X, Z, n_lvl), (w.shape, levels[0].shape)
    assert k2.shape == (C, K) and a.shape == (C,) and b.shape == (C,)
    factors = []
    for lv in levels:
        assert (lv.shape[0], lv.shape[1], lv.shape[3], lv.shape[4]) == \
            (B, Y, Z, C), (lv.shape, levels[0].shape)
        fx = X // lv.shape[2]
        assert fx * lv.shape[2] == X, (lv.shape, X)
        factors.append(fx)

    # row-band tile: the lerp phase stacks + the blend accumulator cost a
    # handful of live band-sized buffers; stay well inside the 16 MB
    # scoped-vmem stack limit (same sizing rule as pallas_occ_fuse)
    budget = 512 * 1024
    band = X * Z * C * levels[0].dtype.itemsize
    TY = max(1, min(Y, budget // band))
    while Y % TY:
        TY -= 1

    grid = (B, Y // TY)
    in_specs = [
        pl.BlockSpec((1, TY, lv.shape[2], Z, C),
                     lambda bi, t: (bi, t, 0, 0, 0))
        for lv in levels
    ]
    in_specs.append(
        pl.BlockSpec((1, TY, X, Z, n_lvl), lambda bi, t: (bi, t, 0, 0, 0)))
    in_specs.append(pl.BlockSpec((1, C), lambda bi, t: (0, 0)))  # a
    in_specs.append(pl.BlockSpec((1, C), lambda bi, t: (0, 0)))  # b
    in_specs.append(pl.BlockSpec((C, K), lambda bi, t: (0, 0)))  # k2

    rows = TY * X * Z
    out = pl.pallas_call(
        functools.partial(_kernel, factors=tuple(factors), n_lvl=n_lvl),
        out_shape=jax.ShapeDtypeStruct((B, (Y // TY) * rows, K),
                                       levels[0].dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows, K), lambda bi, t: (bi, t, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(12 * B * Y * X * Z * C * n_lvl
                   + 2 * B * Y * X * Z * C * K),
            bytes_accessed=sum(
                lv.size * lv.dtype.itemsize for lv in levels)
            + w.size * w.dtype.itemsize
            + B * Y * X * Z * K * levels[0].dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*levels, w, a.reshape(1, C), b.reshape(1, C), k2)
    return out.reshape(B, Y, X, Z, K)


def occ_tail_reference(levels, w, a, b, k2):
    """Pure-XLA implementation with op-for-op identical math/dtype order
    to the kernel (tests pin exact equality in interpret mode)."""
    out = None
    cdt = levels[0].dtype
    B, Y, X, Z, C = levels[0].shape
    for i, lv in enumerate(levels):
        fx = X // lv.shape[2]
        v = _upsample_x(lv.reshape(B * Y, lv.shape[2], Z, C), fx)
        t = v.reshape(B, Y, X, Z, C) * w[..., i:i + 1]
        out = t if out is None else out + t
    h = jnp.maximum(out * a.astype(cdt) + b.astype(cdt), 0)
    logits = jnp.dot(h.reshape(-1, C), k2.astype(cdt),
                     preferred_element_type=jnp.float32)
    return logits.astype(cdt).reshape(B, Y, X, Z, k2.shape[-1])
