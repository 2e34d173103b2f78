"""Probe: does Mosaic lower jnp.take (VMEM dynamic row gather) inside a
Pallas TPU kernel on this stack, and how fast is it?

If yes at decent throughput, it unlocks (a) direct 4-corner gather
deformable sampling (replacing the 177 GFLOP one-hot matmuls) and (b) a
sorted-rank bev_pool kernel (feat-table gather + chunked segment sums).
"""
import sys
sys.path.insert(0, "tools")

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from profile_trace import profile_callable

H, W, C = 16, 48, 128   # value table (lane-padded)
R = 8192                # gathered rows per program
NPROG = 48              # grid size


def kern(tab_ref, idx_ref, o_ref):
    # tab is pre-padded to (R, C); Mosaic's tpu.dynamic_gather only
    # supports take_along_axis patterns (all shapes equal, one batched dim)
    tab = tab_ref[0]                      # (R, C)
    idx = idx_ref[pl.program_id(0)]       # (R,)
    idx2 = jnp.broadcast_to(idx[:, None], tab.shape)
    o_ref[0] = jnp.take_along_axis(tab, idx2, axis=0)


@jax.jit
def run(tab, idx):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NPROG, R, C), tab.dtype),
        grid=(NPROG,),
        in_specs=[
            pl.BlockSpec((1, R, C), lambda i: (0, 0, 0)),
            pl.BlockSpec((NPROG, R), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R, C), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(tab, idx)


def main():
    rng = np.random.RandomState(0)
    tab = jnp.asarray(rng.randn(1, H * W, C).astype(np.float32))
    tab = jnp.pad(tab, ((0, 0), (0, R - H * W), (0, 0)))
    idx = jnp.asarray(
        rng.randint(0, H * W, size=(NPROG, R)), jnp.int32)
    out = run(tab, idx)
    ref = np.asarray(tab[0].astype(jnp.float32))[
        np.asarray(idx).reshape(-1)].reshape(NPROG, R, C)
    err = float(np.max(np.abs(np.asarray(out).astype(np.float32)
                              - ref.astype(np.float32))))
    print("maxerr", err)
    module_ms, total, rows = profile_callable(run, (tab, idx), iters=5)
    nrows = NPROG * R
    print(f"module {module_ms:.3f} ms for {nrows} gathered rows of "
          f"{C}ch f32 -> {nrows / module_ms / 1e6:.1f} Mrows/s, "
          f"{nrows * C * 2 / module_ms / 1e6:.1f} GB/s")


if __name__ == "__main__":
    main()
