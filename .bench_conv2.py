"""Real R50 layer shapes: XLA conv vs shift-matmul, incl 1x1 and stride 2."""
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


def conv_xla(x, w, s=1):
    return lax.conv_general_dilated(
        x, w, (s, s), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def conv_shift(x, w, s=1):
    B, H, W, Ci = x.shape
    k = w.shape[0]
    Co = w.shape[-1]
    p = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    Ho, Wo = H // s, W // s
    out = jnp.zeros((B, Ho, Wo, Co), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            xs = lax.slice(
                xp, (0, dy, dx, 0),
                (B, dy + (Ho - 1) * s + 1, dx + (Wo - 1) * s + 1, Ci),
                (1, s, s, 1))
            out = out + jnp.einsum("bhwc,cd->bhwd", xs, w[dy, dx],
                                   preferred_element_type=jnp.float32)
    return out


# (B, H, W, Ci, Co, k, s, count_in_r50, name)
shapes = [
    (6, 128, 352, 3, 64, 7, 2, 1, "stem7x7"),
    (6, 64, 176, 64, 64, 3, 1, 3, "s1-3x3"),
    (6, 64, 176, 64, 256, 1, 1, 4, "s1-1x1up"),
    (6, 64, 176, 256, 64, 1, 1, 2, "s1-1x1dn"),
    (6, 32, 88, 128, 128, 3, 1, 4, "s2-3x3"),
    (6, 32, 88, 128, 512, 1, 1, 5, "s2-1x1up"),
    (6, 32, 88, 512, 128, 1, 1, 3, "s2-1x1dn"),
    (6, 16, 44, 256, 256, 3, 1, 6, "s3-3x3"),
    (6, 16, 44, 256, 1024, 1, 1, 7, "s3-1x1up"),
    (6, 16, 44, 1024, 256, 1, 1, 5, "s3-1x1dn"),
    (6, 8, 22, 512, 512, 3, 1, 3, "s4-3x3"),
    (6, 8, 22, 512, 2048, 1, 1, 4, "s4-1x1up"),
    (6, 8, 22, 2048, 512, 1, 1, 2, "s4-1x1dn"),
]

tot = {"xla": 0.0, "shift": 0.0}
for B, H, W, Ci, Co, k, s, cnt, name in shapes:
    x = jnp.asarray(rng.randn(B, H, W, Ci), jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, k, Ci, Co), jnp.bfloat16)
    fl = 2 * B * (H // s) * (W // s) * Ci * Co * k * k
    row = f"{name:9s} {B}x{H}x{W}x{Ci:4d}->{Co:4d} k{k}s{s} x{cnt}:"
    for label in ("xla", "shift"):
        if label == "shift" and (k == 1 or k == 7):
            tot[label] += tot_last * cnt
            continue
        fn = jax.jit(functools.partial(
            conv_xla if label == "xla" else conv_shift, s=s))
        if label == "shift":
            o = np.asarray(fn(x, w))
            err = np.abs(o - ref).max() / max(np.abs(ref).max(), 1e-6)
            assert err < 2e-2, (name, err)
        else:
            ref = np.asarray(fn(x, w))
        t = timeit(fn, x, w)
        tot_last = t
        tot[label] += t * cnt
        row += f"  {label} {t*1e3:6.2f}ms {fl/t/1e12:5.1f}TF"
    print(row, flush=True)

print(f"\nsum over r50 (incl dispatch overhead per-op): "
      f"xla {tot['xla']*1e3:.1f} ms, shift-where-applicable "
      f"{tot['shift']*1e3:.1f} ms", flush=True)
