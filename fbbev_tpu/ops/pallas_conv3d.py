"""Pallas TPU kernel: 3x3x3 stride-1 SAME 3D convolution, channels-last.

The TPU-native replacement for the z-slab decomposition of the BEV
voxel-encoder convolutions (``models/layers.py Conv3DZSlab``; reference
op: dense 3D convs in ``/root/reference/mmdet3d/models/fbbev/modules/
resnet3d.py`` / ``fpn3d.py`` / ``occupancy_head.py``).

Why a kernel: the eval graph runs ~600 GFLOP of 3x3x3 convs per frame
(FPN3D's 256->256 conv at (100,100,8) alone is 283 GFLOP).  The z-slab
decomposition issues three z-shifted 2D convolutions per conv -- each
re-reads the input volume from HBM and materialises a partial output --
and measures ~45-75 TF/s.  This kernel reads each input tile ONCE
(double-buffered DMA, halo included), builds the z-banded im2col in VMEM
with sublane shifts, and feeds the MXU contractions of width K = 3*Cin
(384/768 for the 128/256-channel convs -- exact 128-lane multiples):

    out[y, x, z, :] = sum_{dy,dx} X[y+dy-1, x+dx-1, z-1:z+2, :] . W[dy,dx]

where the (Z, Cin) -> (Z, 3*Cin) band build is three sublane-axis shifts
(zero-filled at the z edges = zero padding in z).

The kernel also sidesteps the v5e worker-crash family: the z-slab
decomposition composed with Pallas kernels in full eval graphs faults the
worker at execution (docs/ROUND2.md), which kept the fused occ-head
kernel opt-in.  Routing the 3x3x3 convs here removes z-slab from eval
graphs entirely.

Eval/serving only (no custom VJP; training keeps the z-slab path whose
backward is known-good on v5e with remat disabled on the 3D encoder).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# double-buffered input-slab VMEM budget (core total ~16 MB; weights for a
# 256->256 conv take 3.6 MB and the f32 accumulator up to 0.9 MB)
_SLAB_BUDGET = 8 * 1024 * 1024

# candidate BEV tile edges, largest first (both must divide Y / X)
_TILES = (16, 10, 8, 5, 4, 2)


def _pick_tiles(Y: int, X: int, Z: int, Cin: int, itemsize: int):
    """Largest (TY, TX) whose double-buffered halo slab fits the budget."""
    for ty in _TILES:
        if Y % ty:
            continue
        for tx in _TILES:
            if X % tx:
                continue
            slab = 2 * (ty + 2) * (tx + 2) * Z * Cin * itemsize
            if slab <= _SLAB_BUDGET:
                return ty, tx
    return None


def supports(shape, Cout: int) -> bool:
    """Whether :func:`conv3d_3x3x3` handles (B, Y, X, Z, Cin) -> Cout."""
    if len(shape) != 5:
        return False
    B, Y, X, Z, Cin = shape
    if Cin % 128 and Cin != 64:
        return False  # lane-ragged K tiles: let XLA have it
    if Cout % 64:
        return False
    if Z < 2 or Z > 32:
        return False
    return _pick_tiles(Y, X, Z, Cin, 2) is not None


def _kernel(xp_ref, w_ref, out_ref, slabs, sems, *,
            TY, TX, Z, Cin, Cout, Ht, Wt, NB):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    def dma(bb, ii, jj, slot):
        return pltpu.make_async_copy(
            xp_ref.at[bb, pl.ds(ii * TY, TY + 2), pl.ds(jj * TX, TX + 2)],
            slabs.at[slot], sems.at[slot])

    step = (b * Ht + i) * Wt + j
    par = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        dma(b, i, j, par).start()

    # linear successor (b, i, j) for the cross-step double buffer
    nj = j + 1
    cj = (nj == Wt).astype(jnp.int32)
    nj = nj * (1 - cj)
    ni = i + cj
    ci = (ni == Ht).astype(jnp.int32)
    ni = ni * (1 - ci)
    nb = jnp.minimum(b + ci, NB - 1)

    @pl.when(step < NB * Ht * Wt - 1)
    def _():
        dma(nb, ni, nj, 1 - par).start()

    dma(b, i, j, par).wait()
    slab = slabs[par]  # (TY+2, TX+2, Z, Cin)

    N = TY * TX
    acc = jnp.zeros((N * Z, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = slab[dy:dy + TY, dx:dx + TX].reshape(N, Z, Cin)
            zero = jnp.zeros((N, 1, Cin), tap.dtype)
            # z band: block dz multiplies x[z + dz - 1]; zero fill at the
            # z edges reproduces the SAME zero padding
            band = jnp.concatenate([
                jnp.concatenate([zero, tap[:, :-1]], axis=1),
                tap,
                jnp.concatenate([tap[:, 1:], zero], axis=1),
            ], axis=-1).reshape(N * Z, 3 * Cin)
            acc = acc + jnp.dot(band, w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(TY, TX, Z, Cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3d_3x3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """3x3x3 stride-1 SAME conv.

    Args:
      x: (B, Y, X, Z, Cin) channels-last voxel volume.
      kernel: (3, 3, 3, Cin, Cout) -- ``nn.Conv`` (DHWIO) layout with the
        taps ordered (dy, dx, dz), matching ``Conv3DZSlab``.

    Returns: (B, Y, X, Z, Cout), dtype of ``x``.
    """
    B, Y, X, Z, Cin = x.shape
    Cout = kernel.shape[-1]
    assert kernel.shape == (3, 3, 3, Cin, Cout), kernel.shape
    tiles = _pick_tiles(Y, X, Z, Cin, x.dtype.itemsize)
    assert tiles is not None, (x.shape, "unsupported; gate on supports()")
    TY, TX = tiles
    Ht, Wt = Y // TY, X // TX

    # zero halo in y/x (z is zero-filled in-kernel); ~0.03 ms at BEV sizes
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    # (dy, dx, dz, Cin, Cout) -> (dy, dx, (dz, Cin), Cout): rows of the
    # z-banded im2col are (z-1 | z | z+1) blocks of Cin channels
    w = kernel.reshape(3, 3, 3 * Cin, Cout).astype(x.dtype)

    kern = functools.partial(_kernel, TY=TY, TX=TX, Z=Z, Cin=Cin,
                             Cout=Cout, Ht=Ht, Wt=Wt, NB=B)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Y, X, Z, Cout), x.dtype),
        grid=(B, Ht, Wt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TY, TX, Z, Cout), lambda b, i, j: (b, i, j, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TY + 2, TX + 2, Z, Cin), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # cross-step double buffering relies on linear execution order
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Y * X * Z * 27 * Cin * Cout,
            bytes_accessed=(B * Ht * Wt * (TY + 2) * (TX + 2) * Z * Cin
                            + B * Y * X * Z * Cout) * x.dtype.itemsize
            + 27 * Cin * Cout * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w)
    return out
