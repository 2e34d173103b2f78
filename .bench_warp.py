"""Correctness + perf check of the Pallas affine warp vs the XLA warps (TPU)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from fbbev_tpu.ops.grid_sample import grid_sample_3d, grid_sample_3d_tiled
from fbbev_tpu.ops.pallas_warp import warp_affine_3d, flow_matrix_from_grid_args
from fbbev_tpu import geometry

def sync(x):
    return np.asarray(x.ravel()[0])

B, D, H, W, C = 1, 8, 100, 100, 1280
rng = np.random.RandomState(0)
vol = jnp.asarray(rng.randn(B, D, H, W, C).astype(np.float32)).astype(jnp.bfloat16)

# realistic flow: yaw ~5deg + translation, small pitch
th = np.deg2rad(5.0)
M = np.eye(4, dtype=np.float32)
M[0, 0] = np.cos(th); M[0, 1] = -np.sin(th)
M[1, 0] = np.sin(th); M[1, 1] = np.cos(th)
M[0, 3] = 3.7; M[1, 3] = -2.2; M[2, 3] = 0.3
M[2, 0] = 0.01  # slight pitch coupling
mat = jnp.asarray(M)[None]

# grid for the XLA reference path: normalised coords
norm = jnp.array([W - 1.0, H - 1.0, D - 1.0], jnp.float32)
ys, xs, zs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(D, dtype=jnp.float32), indexing="ij")
g = jnp.stack([xs, ys, zs, jnp.ones_like(xs)], -1)
warped = jnp.einsum("bij,hwzj->bhwzi", mat, g)[..., :3]
grid = jnp.transpose(warped / norm * 2.0 - 1.0, (0, 3, 1, 2, 4))

ref = grid_sample_3d(vol.astype(jnp.float32), grid, align_corners=True)
out = warp_affine_3d(vol, mat, out_zyx=True)
err = np.asarray(jnp.max(jnp.abs(ref - out.astype(jnp.float32))))
scale = np.asarray(jnp.max(jnp.abs(ref)))
print("max abs err vs exact-f32:", err, " (bf16 scale ~", float(scale), ")")

out_yxz = warp_affine_3d(vol, mat, out_zyx=False)
ref_yxz = jnp.transpose(ref, (0, 2, 3, 1, 4))
err2 = np.asarray(jnp.max(jnp.abs(ref_yxz - out_yxz.astype(jnp.float32))))
print("yxz layout err:", err2)

# bf16 apples-to-apples: XLA tiled (bf16) vs pallas (bf16)
tiled = grid_sample_3d_tiled(vol, grid, align_corners=True, tile=4, slab_xy=8)
err3 = np.asarray(jnp.max(jnp.abs(tiled.astype(jnp.float32) - out.astype(jnp.float32))))
print("pallas vs xla-tiled(bf16):", err3)

f_tiled = jax.jit(lambda v, g: grid_sample_3d_tiled(v, g, align_corners=True, tile=4, slab_xy=8))
f_pallas = jax.jit(lambda v, m: warp_affine_3d(v, m, out_zyx=False))

for name, f, a in [("xla_tiled", f_tiled, (vol, grid)), ("pallas", f_pallas, (vol, mat))]:
    o = f(*a); sync(o)
    t0 = time.perf_counter()
    for _ in range(20):
        o = f(*a)
    sync(o)
    print(f"{name:10s}: {(time.perf_counter()-t0)/20*1e3:7.2f} ms", flush=True)
