"""What does the MXU actually deliver through this stack? (axon v5e)"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def timeit(f, *a, n=20):
    o = f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


rng = np.random.RandomState(0)

# 1. pure matmul peak
for M, K, N in [(4096, 4096, 4096), (8192, 8192, 8192)]:
    a = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    b = jnp.asarray(rng.randn(K, N), jnp.bfloat16)
    f = jax.jit(lambda a, b: a @ b)
    t = timeit(f, a, b)
    print(f"matmul {M}x{K}x{N} bf16: {t*1e3:7.2f} ms  "
          f"{2*M*K*N/t/1e12:6.1f} TFLOP/s", flush=True)

# 2. conv shapes from the model (channels-last NHWC)
import functools
from jax import lax

def conv2d(x, w, stride=1):
    return lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)

shapes = [
    # R50 stage shapes (B=6 cams, 256x704 input)
    (6, 64, 176, 256, 256, 3, 1, "r50-c2"),
    (6, 32, 88, 512, 512, 3, 1, "r50-c3"),
    (6, 16, 44, 1024, 1024, 3, 1, "r50-c4"),
    (6, 8, 22, 2048, 2048, 3, 1, "r50-c5"),
    # 3D encoder z-folded: (B*Z, Y, X, C)
    (8, 100, 100, 192, 64, 3, 1, "enc3d-like"),
    (8, 100, 100, 128, 128, 3, 1, "enc3d-128"),
]
for B, H, W, Ci, Co, k, s, name in shapes:
    x = jnp.asarray(rng.randn(B, H, W, Ci), jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, k, Ci, Co), jnp.bfloat16)
    f = jax.jit(functools.partial(conv2d, stride=s))
    t = timeit(f, x, w)
    fl = 2 * B * H * W * Ci * Co * k * k / (s * s)
    print(f"conv {name:10s} {B}x{H}x{W}x{Ci}->{Co} k{k}: {t*1e3:7.2f} ms  "
          f"{fl/t/1e12:6.1f} TFLOP/s", flush=True)

# 3. 3D conv direct vs z-slab
x3 = jnp.asarray(rng.randn(1, 100, 100, 8, 64), jnp.bfloat16)  # NHWDC
w3 = jnp.asarray(rng.randn(3, 3, 3, 64, 64), jnp.bfloat16)
def conv3d(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME",
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        preferred_element_type=jnp.float32)
f = jax.jit(conv3d)
t = timeit(f, x3, w3)
fl = 2 * 100 * 100 * 8 * 64 * 64 * 27
print(f"conv3d 100x100x8x64->64 k3: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TFLOP/s", flush=True)

# 4. same 3D conv as one big im2col matmul
def im2col3d(x, w):
    B, H, W, D, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    cols = []
    for dy in range(3):
        for dx in range(3):
            for dz in range(3):
                cols.append(lax.dynamic_slice(
                    xp, (0, dy, dx, dz, 0), (B, H, W, D, C)))
    col = jnp.concatenate(cols, -1).reshape(B * H * W * D, 27 * C)
    return (col @ w.reshape(27 * C, -1)).reshape(B, H, W, D, -1)
w3m = jnp.transpose(w3, (0, 1, 2, 3, 4)).reshape(27 * 64, 64)
f = jax.jit(lambda x, w: im2col3d(x, w3))
t = timeit(f, x3, w3m)
print(f"conv3d im2col-matmul:       {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TFLOP/s", flush=True)
