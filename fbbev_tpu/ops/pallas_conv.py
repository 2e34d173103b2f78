"""Pallas TPU kernel: 3x3 stride-1 SAME conv (NHWC) as blocked im2col +
MXU matmul.

Motivation (docs/PERF.md): XLA's TPU convolution emitter delivers only
~10-30 TFLOP/s on every conv shape in this model (vs ~149 TFLOP/s peak
matmul through the same stack), and convs are the largest coherent block
of the forward pass (z-slab 3D-encoder convs + the R50 image encoder).
The same implicit GEMM done explicitly keeps the MXU fed.

Design: the nine (dy, dx) shifted views of the zero-padded input are
materialised by XLA as one stacked HBM array (a fused pad+copy, ~10x the
input's bytes -- microseconds at HBM bandwidth).  The kernel then only
ever touches *aligned* VMEM blocks: per grid step (batch row, row-tile)
it reshapes each shifted slab to an (rows, Cin) panel and either
accumulates nine (rows, Cin) @ (Cin, Cout) MXU matmuls (``fuse_k=False``)
or concatenates along Cin and issues one (rows, 9*Cin) @ (9*Cin, Cout)
matmul (``fuse_k=True``).  Accumulation is f32; output is cast back to
the input dtype.  Mosaic alignment rules shape the tiling: the
(TY, Wp, C) -> (TY*Wp, C) im2col reshape is a layout no-op only when the
W tile is a multiple of 8 sublanes, so W is padded up to a multiple of 8
(padded columns fall outside the SAME halo and are sliced off).

Scope: kernel 3x3, stride 1, SAME padding, no dilation -- the hot conv
shapes (ResNet 3x3s, every Conv3DZSlab inner conv).  Strided /
other-kernel convs stay on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-block VMEM budget for the nine double-buffered input slabs (bytes);
# v5e VMEM is ~16 MB, leave room for weights/output/accumulator
_SLAB_BUDGET = 6 * 1024 * 1024


def _pick_tile(n: int, lo: int, hi: int, step: int = 1) -> int:
    """Largest divisor of n in [lo, hi] that is a multiple of ``step``,
    else 0."""
    for t in range(hi - hi % step, lo - 1, -step):
        if t and n % t == 0:
            return t
    return 0


def _kernel(xs_ref, w_ref, o_ref, *, TY, Wp, Cin, Cout, fuse_k):
    rows = TY * Wp
    if fuse_k:
        col = jnp.concatenate(
            [xs_ref[k, 0].reshape(rows, Cin) for k in range(9)], axis=1)
        out = jnp.dot(col, w_ref[:].reshape(9 * Cin, Cout),
                      preferred_element_type=jnp.float32)
    else:
        out = jnp.zeros((rows, Cout), jnp.float32)
        for k in range(9):
            out = out + jnp.dot(xs_ref[k, 0].reshape(rows, Cin), w_ref[k],
                                preferred_element_type=jnp.float32)
    o_ref[0] = out.reshape(TY, Wp, Cout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "fuse_k"))
def conv3x3_s1(x: jnp.ndarray, w: jnp.ndarray, interpret=None,
               fuse_k: bool = True) -> jnp.ndarray:
    """3x3 stride-1 SAME conv: x (B, H, W, Cin), w (3, 3, Cin, Cout) ->
    (B, H, W, Cout), f32-accumulated, cast to x.dtype.

    ``interpret=None`` auto-selects Pallas interpret mode off-TPU (CPU
    tests exercise the same kernel code path)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    Wp = W + (-W) % 8
    Hp = H if _pick_tile(H, 1, 32) >= 4 else H + (-H) % 8
    # largest row-tile whose nine double-buffered slabs fit the budget
    cap = max(1, _SLAB_BUDGET // (9 * 2 * Wp * Cin * x.dtype.itemsize))
    TY = _pick_tile(Hp, 1, min(32, cap))
    Ht = Hp // TY

    xp = jnp.pad(x, ((0, 0), (1, 1 + Hp - H), (1, 1 + Wp - W), (0, 0)))
    shifts = jnp.stack([xp[:, dy:dy + Hp, dx:dx + Wp, :]
                        for dy in range(3) for dx in range(3)])
    wf = w.reshape(9, Cin, Cout).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, TY=TY, Wp=Wp, Cin=Cin, Cout=Cout,
                          fuse_k=fuse_k),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, Cout), x.dtype),
        grid=(B, Ht),
        in_specs=[
            pl.BlockSpec((9, 1, TY, Wp, Cin), lambda b, i: (0, b, i, 0, 0)),
            pl.BlockSpec((9, Cin, Cout), lambda b, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TY, Wp, Cout), lambda b, i: (b, i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hp * Wp * 9 * Cin * Cout,
            bytes_accessed=B * Hp * Wp * (9 * Cin + Cout) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(shifts, wf)
    return out[:, :H, :W]


def supports(shape, kernel_shape, strides, padding, dilation) -> bool:
    """Gate for ConvBN: 3x3 stride-1 SAME-pad 2D convs with lane-friendly
    channels (spatial dims are padded to tileable sizes internally)."""
    B, H, W, Cin = shape
    if tuple(kernel_shape) != (3, 3) or tuple(strides) != (1, 1):
        return False
    if tuple(dilation) != (1, 1):
        return False
    if padding not in ("SAME", ((1, 1), (1, 1)), [(1, 1), (1, 1)]):
        return False
    return Cin % 64 == 0 and H >= 4 and W >= 8


# ----------------------------------------------------------------------
# Differentiable wrapper: dgrad is itself a 3x3 s1 SAME conv (flipped,
# io-transposed weights -> the same Pallas kernel); wgrad is nine
# (Cin, Cout) MXU contractions over shifted input slices.


@jax.custom_vjp
def conv3x3(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Differentiable 3x3 stride-1 SAME conv on the Pallas kernel."""
    return conv3x3_s1(x, w)


def _conv3x3_fwd(x, w):
    return conv3x3_s1(x, w), (x, w)


def _conv3x3_bwd(res, g):
    x, w = res
    wT = jnp.transpose(jnp.flip(w, (0, 1)), (0, 1, 3, 2))
    dx = conv3x3_s1(g, wT.astype(g.dtype))
    B, H, W, Cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [jnp.einsum("bhwc,bhwo->co",
                       xp[:, dy:dy + H, dx_:dx_ + W, :].astype(jnp.float32),
                       g.astype(jnp.float32))
            for dy in range(3) for dx_ in range(3)]
    dw = jnp.stack(taps).reshape(3, 3, Cin, -1)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)
