"""Conv reformulation shootout: XLA conv vs shift-matmul variants (v5e)."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(f, *a, n=30):
    o = f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


rng = np.random.RandomState(0)
OVERHEAD = None  # measured dispatch overhead


def conv_xla(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def conv_shift(x, w):
    """3x3 conv as 9 shifted (M, Ci) @ (Ci, Co) matmuls, accumulated."""
    B, H, W, Ci = x.shape
    Co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((B, H, W, Co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, Ci))
            out = out + jnp.einsum(
                "bhwc,cd->bhwd", xs, w[dy, dx],
                preferred_element_type=jnp.float32)
    return out


def conv_shift_flat(x, w):
    """Shifts along a flattened (B*H, W) row axis: pad W only, roll rows."""
    B, H, W, Ci = x.shape
    Co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Hp, Wp = H + 2, W + 2
    xf = xp.reshape(B * Hp * Wp, Ci)
    out = jnp.zeros((B * Hp * Wp, Co), jnp.float32)
    # accumulate into the padded canvas, then slice once
    for dy in range(3):
        for dx in range(3):
            shift = (dy * Wp + dx)
            contrib = xf @ w[2 - dy, 2 - dx]  # correlation orientation
            out = out + jnp.roll(contrib, (1 * Wp + 1) - shift, axis=0)
    out = out.reshape(B, Hp, Wp, Co)[:, 1:-1, 1:-1]
    return out


shapes = [
    (6, 64, 176, 256, 256, "r50-c2"),
    (6, 32, 88, 512, 512, "r50-c3"),
    (8, 100, 100, 128, 128, "enc3d-128"),
    (8, 100, 100, 192, 64, "enc3d-like"),
]

for B, H, W, Ci, Co, name in shapes:
    x = jnp.asarray(rng.randn(B, H, W, Ci), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, Ci, Co), jnp.bfloat16)
    fl = 2 * B * H * W * Ci * Co * 9
    ref = None
    for label, fn in [("xla", conv_xla), ("shift", conv_shift)]:
        f = jax.jit(fn)
        o = np.asarray(f(x, w))
        if ref is None:
            ref = o
        else:
            err = np.abs(o - ref).max() / max(np.abs(ref).max(), 1e-6)
            assert err < 2e-2, (label, err)
        t = timeit(f, x, w)
        print(f"{name:10s} {label:10s}: {t*1e3:7.2f} ms  "
              f"{fl/t/1e12:6.1f} TFLOP/s", flush=True)

# dispatch overhead probe: trivial op
f0 = jax.jit(lambda x: x + 1.0)
xs = jnp.zeros((8, 128), jnp.float32)
print(f"dispatch overhead: {timeit(f0, xs, n=50)*1e3:.2f} ms", flush=True)
