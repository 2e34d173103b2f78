"""Pallas TPU kernel: affine 3-D history warp (the SoloFusion temporal
ego-motion warp, ``/root/reference/mmdet3d/models/fbbev/detectors/fbocc.py:275``).

The reference warps the (T*C)-channel history volume with ``F.grid_sample``
(5-D, align_corners=True, zero padding) where the grid is a pure affine
function of the per-sample flow matrix (``generate_grid``, fbocc.py:169-205).
The XLA formulations pay for this either in random-row gathers (~15 GB/s
effective) or, in the locality-tiled one-hot form, in materialising ~4x
overlapping source slabs through HBM (docs/PERF.md).

This kernel exploits the affine structure end-to-end:

* the sampling grid is never materialised -- each program reconstructs its
  tile's source coordinates from the (3, 4) flow matrix with iota math
  (the grid tensor, its einsum, and the 4x4 inverses all disappear);
* each (D, TILE, TILE) output tile DMAs one (D, SLAB_Y, SLAB_X) source
  slab HBM->VMEM once per channel block (slab origin from the warped tile
  centre, scalar math; channel blocks are disjoint so total HBM traffic is
  ~2.6x the volume instead of the XLA path's ~8x);
* exact trilinear interpolation is one MXU matmul per output z-plane:
  W[out, slab_cell] = tent(x'-sx) * tent(y'-sy) * tent(z'-sz), the product
  of three 1-D tent functions, reproduces the 8-corner trilinear weights
  exactly, and zero-padding semantics emerge for free (out-of-volume
  samples overlap no in-volume cell, so their tents vanish).  Contraction
  is restricted to a 3-z-plane band per output plane to bound FLOPs.

Correctness domain (same contract as ``grid_sample_3d_tiled``): the warp
must be locality-bounded -- a TILE x TILE output tile's samples must fit
the slab around the warped tile centre.  With TILE=10, SLAB_Y=16 and
SLAB_X=32 (x pays a 7-cell alignment tax: HBM slices of the second-minor
dim must start 8-aligned) that holds for in-plane rotations up to ~30 deg
plus translation spill; frame-to-frame ego motion is well inside.  The
z band covers floor(z'_centre)-1 .. +1, exact for |pitch/roll| spread
under one cell per tile.  Out-of-domain samples clamp to the slab edge
(XLA-tiled fallback behaves identically).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 10
SLAB_Y = 16
SLAB_X = 32
ZBAND = 3
# 2 double-buffered slabs must fit VMEM alongside the output tile
_CB_MAX = 320


def _slab_origin(mat_ref, b, i, j, *, D, H, W):
    """Scalar slab origin (oy, ox) for tile (b, i, j)."""
    m00 = mat_ref[b, 0]
    m01 = mat_ref[b, 1]
    m02 = mat_ref[b, 2]
    m03 = mat_ref[b, 3]
    m10 = mat_ref[b, 4]
    m11 = mat_ref[b, 5]
    m12 = mat_ref[b, 6]
    m13 = mat_ref[b, 7]
    cx = (j * TILE).astype(jnp.float32) + (TILE - 1) * 0.5
    cy = (i * TILE).astype(jnp.float32) + (TILE - 1) * 0.5
    cz = (D - 1) * 0.5
    sx_c = m00 * cx + m01 * cy + m02 * cz + m03
    sy_c = m10 * cx + m11 * cy + m12 * cz + m13
    # y origin: exact (leading dims of the HBM memref slice freely)
    oy = jnp.clip(jnp.floor(sy_c).astype(jnp.int32) - SLAB_Y // 2 + 1,
                  0, H - SLAB_Y)
    # x origin: 8-aligned (second-minor dim of the tiled memref); the
    # tile-padded memref row length cushions the right edge
    w_pad = -(-W // 8) * 8
    ox_raw = jnp.floor(sx_c).astype(jnp.int32) - SLAB_X // 2 + 4
    ox = jnp.clip((ox_raw // 8) * 8, 0, w_pad - SLAB_X)
    return oy, pl.multiple_of(ox, 8)


def _warp_kernel(mat_ref, vol_ref, out_ref, slabs, sems, *, D, H, W, CB,
                 NCB, Ht, Wt, NB, out_zyx: bool):
    b = pl.program_id(0)
    i = pl.program_id(1)   # tile row (y)
    j = pl.program_id(2)   # tile col (x)
    k = pl.program_id(3)   # channel block

    m00 = mat_ref[b, 0]
    m01 = mat_ref[b, 1]
    m02 = mat_ref[b, 2]
    m03 = mat_ref[b, 3]
    m10 = mat_ref[b, 4]
    m11 = mat_ref[b, 5]
    m12 = mat_ref[b, 6]
    m13 = mat_ref[b, 7]
    m20 = mat_ref[b, 8]
    m21 = mat_ref[b, 9]
    m22 = mat_ref[b, 10]
    m23 = mat_ref[b, 11]

    y0 = (i * TILE).astype(jnp.float32)
    x0 = (j * TILE).astype(jnp.float32)
    cx = x0 + (TILE - 1) * 0.5
    cy = y0 + (TILE - 1) * 0.5

    # ---- cross-step double-buffered slab DMA: program `step` waits on the
    # slab its predecessor prefetched and starts the DMA for `step + 1`,
    # overlapping HBM latency with the tent matmuls (grid dims are all
    # "arbitrary", i.e. sequential, so scratch persists across steps).
    def dma(bb, ii, jj, kk, slot):
        oy_, ox_ = _slab_origin(mat_ref, bb, ii, jj, D=D, H=H, W=W)
        return pltpu.make_async_copy(
            vol_ref.at[bb, :, pl.ds(oy_, SLAB_Y), pl.ds(ox_, SLAB_X),
                       pl.ds(kk * CB, CB)],
            slabs.at[slot], sems.at[slot])

    step = ((b * Ht + i) * Wt + j) * NCB + k
    par = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        dma(b, i, j, k, par).start()

    # next-step indices (k innermost)
    nk = k + 1
    ck = (nk == NCB).astype(jnp.int32)
    nk = nk * (1 - ck)
    nj = j + ck
    cj = (nj == Wt).astype(jnp.int32)
    nj = nj * (1 - cj)
    ni = i + cj
    ci = (ni == Ht).astype(jnp.int32)
    ni = ni * (1 - ci)
    nb = jnp.minimum(b + ci, NB - 1)

    @pl.when(step < NB * Ht * Wt * NCB - 1)
    def _():
        dma(nb, ni, nj, nk, 1 - par).start()

    oy, ox = _slab_origin(mat_ref, b, i, j, D=D, H=H, W=W)

    # per-z-plane output coordinates (y, x row-major), slab-local
    n_o = TILE * TILE
    o = jax.lax.broadcasted_iota(jnp.int32, (n_o, 1), 0)
    gy = (o // TILE).astype(jnp.float32) + y0
    gx = (o % TILE).astype(jnp.float32) + x0
    oxf = ox.astype(jnp.float32)
    oyf = oy.astype(jnp.float32)
    xs0 = m00 * gx + m01 * gy + m03 - oxf
    ys0 = m10 * gx + m11 * gy + m13 - oyf
    zs0 = m20 * gx + m21 * gy + m23

    S = ZBAND * SLAB_Y * SLAB_X
    s_i = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    isz = (s_i // (SLAB_Y * SLAB_X)).astype(jnp.float32)
    isy = ((s_i // SLAB_X) % SLAB_Y).astype(jnp.float32)
    isx_i = s_i % SLAB_X
    isx = isx_i.astype(jnp.float32)
    # mask tile-padding garbage beyond the real x extent
    xmask = ((ox + isx_i) <= W - 1).astype(jnp.float32)

    dma(b, i, j, k, par).wait()

    for z in range(D):
        zf = float(z)
        xs = xs0 + m02 * zf
        ys = ys0 + m12 * zf
        zs = zs0 + m22 * zf
        z_c = m20 * cx + m21 * cy + m22 * zf + m23
        zb = jnp.clip(jnp.floor(z_c).astype(jnp.int32) - (ZBAND - 1) // 2,
                      0, D - ZBAND)
        band = slabs[par, pl.ds(zb, ZBAND)].reshape(S, CB)
        zbf = zb.astype(jnp.float32)
        w = (jnp.maximum(1.0 - jnp.abs(xs - isx), 0.0)
             * jnp.maximum(1.0 - jnp.abs(ys - isy), 0.0)
             * jnp.maximum(1.0 - jnp.abs(zs - zbf - isz), 0.0)
             * xmask)
        out = jnp.dot(w.astype(vol_ref.dtype), band,
                      preferred_element_type=jnp.float32)
        out = out.reshape(TILE, TILE, CB).astype(out_ref.dtype)
        if out_zyx:
            # block (1, 1, 1, TILE, 1, TILE, CB), z via index_map
            out_ref[0, z, 0, :, 0, :, :] = out
        else:
            # block (1, 1, TILE, 1, TILE, D, CB)
            out_ref[0, 0, :, 0, :, z, :] = out


@functools.partial(jax.jit, static_argnames=("out_zyx", "interpret"))
def warp_affine_3d(vol: jnp.ndarray, mat: jnp.ndarray,
                   out_zyx: bool = True,
                   interpret: bool = False) -> jnp.ndarray:
    """Warp ``vol`` (B, D, H, W, C) by the affine flow ``mat`` (B, 3, 4) or
    (B, 4, 4) mapping output (x, y, z) index coords to source index coords
    (align_corners=True pixel units, cf. ``geometry.history_flow_grid``
    *before* its [-1, 1] normalisation).

    Returns (B, D, H, W, C) when ``out_zyx`` else (B, H, W, D, C) -- the
    latter fuses the downstream layout transpose into the kernel's writes.

    Requirements: H, W divisible by TILE and >= SLAB_X; C a multiple of
    128; D >= ZBAND; locality bound per module docstring.  Callers gate on
    these (:func:`supports`) and fall back to the XLA warp otherwise.
    """
    B, D, H, W, C = vol.shape
    assert supports(vol.shape), vol.shape
    mrows = mat[:, :3, :].reshape(B, 12).astype(jnp.float32)
    Ht, Wt = H // TILE, W // TILE
    CB = C if C <= _CB_MAX else max(
        cb for cb in range(128, _CB_MAX + 1, 128) if C % cb == 0)
    NCB = C // CB

    # Mosaic requires the last two block dims be 8/128-aligned or equal to
    # the array dims; (TILE, C) with TILE=10 is neither, so the tiling is
    # exposed as its own (free-to-reshape) array dimensions.
    if out_zyx:
        out_shape = jax.ShapeDtypeStruct((B, D, Ht, TILE, Wt, TILE, C),
                                         vol.dtype)
        out_spec = pl.BlockSpec((1, D, 1, TILE, 1, TILE, CB),
                                lambda b, i, j, k: (b, 0, i, 0, j, 0, k),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((B, Ht, TILE, Wt, TILE, D, C),
                                         vol.dtype)
        out_spec = pl.BlockSpec((1, 1, TILE, 1, TILE, D, CB),
                                lambda b, i, j, k: (b, i, 0, j, 0, 0, k),
                                memory_space=pltpu.VMEM)

    kernel = functools.partial(_warp_kernel, D=D, H=H, W=W, CB=CB,
                               NCB=NCB, Ht=Ht, Wt=Wt, NB=B,
                               out_zyx=out_zyx)
    slab_bytes = D * SLAB_Y * SLAB_X * CB * vol.dtype.itemsize
    tile_bytes = D * TILE * TILE * CB * vol.dtype.itemsize
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(B, Ht, Wt, NCB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, D, SLAB_Y, SLAB_X, CB), vol.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # all-sequential grid: the cross-step double buffering relies
            # on the linear execution order
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Ht * Wt * NCB * D * (TILE * TILE)
            * (ZBAND * SLAB_Y * SLAB_X) * CB,
            bytes_accessed=B * Ht * Wt * NCB * (slab_bytes + tile_bytes),
            transcendentals=0,
        ),
        interpret=interpret,
    )(mrows, vol)
    if out_zyx:
        return out.reshape(B, D, H, W, C)
    return out.reshape(B, H, W, D, C)


def supports(shape) -> bool:
    """Whether :func:`warp_affine_3d` handles this (B, D, H, W, C)."""
    _, D, H, W, C = shape
    return (H % TILE == 0 and W % TILE == 0 and H >= SLAB_X
            and W >= SLAB_X and C % 128 == 0 and D >= ZBAND)


def flow_matrix_from_grid_args(history_forward_augs, forward_augs,
                               curr_to_prev_ego_rt, feat2bev):
    """The (B, 4, 4) affine flow in *index* units -- the un-normalised core
    of :func:`fbbev_tpu.geometry.history_flow_grid` (fbocc.py:197-204)."""
    return (
        jnp.linalg.inv(feat2bev)[None]
        @ history_forward_augs
        @ curr_to_prev_ego_rt
        @ jnp.linalg.inv(forward_augs)
        @ feat2bev[None]
    )
