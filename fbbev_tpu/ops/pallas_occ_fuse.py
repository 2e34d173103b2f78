"""Pallas TPU kernel: fused multi-scale trilinear upsample + soft-weighted
sum for the occupancy head.

Reference semantics: ``OccHead`` multi-scale fusion
(``/root/reference/mmdet3d/models/fbbev/heads/occupancy_head.py:190-212``):
each level is trilinearly upsampled (align_corners=False) to the finest
level's resolution and the levels are blended with per-voxel softmax
weights.

Why a kernel (docs/PERF.md round-2 trace): the XLA formulation
materialises every upsampled level through HBM (~164 MB each at flagship
shapes) and pays sublane relayouts for the Z-axis interleave -- ~7 ms of
the 48 ms eval forward.  Here each level is upsampled along X/Z inside
VMEM, one output row-band at a time, and blended immediately; only the
coarse inputs and the fused output touch HBM (~0.7 ms at HBM bandwidth).

The Y-axis (leading) upsample is done OUTSIDE the kernel by the caller
(`_upsample_int_axis` on axis 1) -- a leading-axis interleave is a free
reshape in XLA, and pre-expanding Y makes every output row-band map to an
aligned input row-band (no halo / overlapping blocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lerp_phases(a, prev, nxt, s: int, axis: int):
    """Stack the s half-pixel phases of a 2-tap lerp along ``axis + 1`` and
    merge: exact integer-factor linear upsample (align_corners=False)."""
    phases = []
    for k in range(s):
        c = (k + 0.5) / s - 0.5
        if c < 0:
            w = c + 1.0
            phases.append((1.0 - w) * prev + w * a)
        else:
            w = c
            phases.append((1.0 - w) * a + w * nxt)
    out = jnp.stack(phases, axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= s
    return out.reshape(shape)


def _upsample_axis(a, axis: int, s: int):
    if s == 1:
        return a
    n = a.shape[axis]
    first = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(a, n - 1, n, axis=axis)
    prev = jnp.concatenate(
        [first, jax.lax.slice_in_dim(a, 0, n - 1, axis=axis)], axis=axis)
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(a, 1, n, axis=axis), last], axis=axis)
    return _lerp_phases(a, prev, nxt, s, axis)


def _kernel(*refs, factors, n_lvl):
    lvl_refs = refs[:n_lvl]
    w_ref = refs[n_lvl]
    o_ref = refs[n_lvl + 1]
    acc = None
    for i in range(n_lvl):
        a = lvl_refs[i][0]  # (TY, X_i, Z_i, C)
        fx, fz = factors[i]
        a = _upsample_axis(a, 2, fz)   # z (sublane dim) first: smallest
        a = _upsample_axis(a, 1, fx)   # then x -> (TY, X, Z, C)
        term = a * w_ref[0][..., i:i + 1]
        acc = term if acc is None else acc + term
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fuse_multiscale(levels, w, interpret=None) -> jnp.ndarray:
    """Blend multi-resolution voxel features with per-voxel weights.

    Args:
      levels: list of (B, Y, X_i, Z_i, C) arrays, ALREADY upsampled along
        Y to the common finest Y (use ``_upsample_int_axis(x, 1, fy)``);
        X_i / Z_i must divide the finest X / Z with integer factors.
      w: (B, Y, X, Z, n_lvl) blend weights (finest resolution).

    Returns: (B, Y, X, Z, C) = sum_i upsample(levels[i]) * w[..., i],
      dtype of levels[0].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Y, X, Z, C = levels[0].shape
    n_lvl = len(levels)
    assert w.shape == (B, Y, X, Z, n_lvl), (w.shape, levels[0].shape)
    factors = []
    for lv in levels:
        assert lv.shape[0] == B and lv.shape[1] == Y and lv.shape[4] == C
        fx, fz = X // lv.shape[2], Z // lv.shape[3]
        assert fx * lv.shape[2] == X and fz * lv.shape[3] == Z, (
            lv.shape, (X, Z))
        factors.append((fx, fz))

    # row-band tile: bound VMEM by the finest-level band (TY, X, Z, C).
    # The lerp phase-stacks cost ~10 live band-sized buffers inside the
    # kernel, and the scoped-vmem stack limit is 16 MB (measured OOM at
    # TY=2 / 23.6 MB for the flagship 200x16x128 band).
    budget = 768 * 1024
    band = X * Z * C * levels[0].dtype.itemsize
    TY = max(1, min(Y, budget // band))
    while Y % TY:
        TY -= 1

    grid = (B, Y // TY)
    in_specs = [
        pl.BlockSpec((1, TY, lv.shape[2], lv.shape[3], C),
                     lambda b, t: (b, t, 0, 0, 0))
        for lv in levels
    ]
    in_specs.append(
        pl.BlockSpec((1, TY, X, Z, n_lvl), lambda b, t: (b, t, 0, 0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, factors=tuple(factors), n_lvl=n_lvl),
        out_shape=jax.ShapeDtypeStruct((B, Y, X, Z, C), levels[0].dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TY, X, Z, C),
                               lambda b, t: (b, t, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * B * Y * X * Z * C * n_lvl,
            bytes_accessed=sum(
                lv.size * lv.dtype.itemsize for lv in levels)
            + w.size * w.dtype.itemsize
            + B * Y * X * Z * C * levels[0].dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*levels, w)
    return out
