"""Attempted minimal repro for the round-1 v5e crash: z-slab conv
decomposition + pointwise matmul decomposition in one TRAINING graph
(backward pass) crashed the TPU worker (commit e23fd9a bisect; layers.py
_POINTWISE_EVAL_ONLY).

Round-2 findings (2026-08-16): this op-pair repro NO LONGER reproduces --
'both' and 'both_barrier' both pass on the current v5e/axon stack.  But
the FULL tiny-config training graph still crashes the worker at
execution when the pointwise decomposition is enabled in train (f32, with
or without optimization_barrier); the identical run passes with
FBBEV_DISABLE_CONV_DECOMP=pointwise.  The fault needs the full backward
graph, so _POINTWISE_EVAL_ONLY stays True (eval/serving keep the fast
matmul path; layouts are identical, so routing by mode is
checkpoint-safe)."""
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

case = sys.argv[1] if len(sys.argv) > 1 else "both"

rng = np.random.RandomState(0)
B, Y, X, Z, C = 1, 100, 100, 8, 64
DT = jnp.float32 if "f32" in case else jnp.bfloat16
x = jnp.asarray(rng.randn(B, Y, X, Z, C).astype(np.float32)).astype(DT)
k3 = jnp.asarray(rng.randn(3, 3, 3, C, C).astype(np.float32) * 0.05).astype(DT)
k1 = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.05).astype(DT)
if "small" in case:
    Y = X = 20
    x = x[:, :20, :20]


def zslab(x, k):
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    out = None
    for dz in range(3):
        xs = jax.lax.slice_in_dim(xp, dz, dz + Z, 1, axis=3)
        x2 = jnp.moveaxis(xs, 3, 1).reshape(B * Z, Y, X, C)
        y2 = jax.lax.conv_general_dilated(
            x2, k[:, :, dz], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y2 = jnp.moveaxis(y2.reshape(B, Z, Y, X, C), 1, 3)
        out = y2 if out is None else out + y2
    return out


def pointwise(x, k):
    return jnp.einsum("...c,co->...o", x, k)


def loss(params, x):
    k3_, k1_ = params
    h = x
    if case.startswith("both") or case == "zslab":
        h = zslab(h, k3_)
    if "norelu" not in case:
        h = jax.nn.relu(h)
    if case == "both_barrier":
        h = jax.lax.optimization_barrier(h)
    if case.startswith("both") or case == "pointwise":
        h = pointwise(h, k1_)
    return jnp.sum(h.astype(jnp.float32) ** 2)


g = jax.jit(jax.grad(loss))((k3, k1), x)
print(case, "grad norms:",
      [float(jnp.linalg.norm(t.astype(jnp.float32))) for t in
       jax.tree.leaves(g)], flush=True)
print("OK", flush=True)
