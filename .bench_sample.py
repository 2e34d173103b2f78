"""Pallas fused deformable sampling vs XLA one-hot scan (TPU, real shapes)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from fbbev_tpu.ops.deform_attn import (bilinear_sample_onehot,
                                       deformable_sample_attend)
from fbbev_tpu.ops.pallas_sample import (bilinear_sample_pallas,
                                         deformable_sample_attend_pallas)


def timeit(f, *a, n=20):
    o = f(*a)
    np.asarray(jax.tree.leaves(o)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    np.asarray(jax.tree.leaves(o)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


rng = np.random.RandomState(0)
# flagship cross-attention shapes: B'=6 (batch*cams), 16x44 value, 4096
# rebatched queries, 8 heads x 8 points, C=80
B, H, W, heads, hd, Q, P = 6, 16, 44, 8, 10, 4096, 8
for dt in (jnp.float32, jnp.bfloat16):
    v = jnp.asarray(rng.randn(B, H * W, heads, hd)).astype(dt)
    loc = jnp.asarray(rng.uniform(0, 1, (B, Q, heads, P, 2)).astype(np.float32))
    attn = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Q, heads, P).astype(np.float32)), -1)
    f_x = jax.jit(lambda v, l, a: deformable_sample_attend(v, (H, W), l, a))
    f_p = jax.jit(lambda v, l, a: deformable_sample_attend_pallas(
        v, (H, W), l, a))
    ref = np.asarray(f_x(v, loc, attn))
    got = np.asarray(f_p(v, loc, attn))
    err = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"cross-attn {dt.__name__}: rel err {err:.5f}  "
          f"xla {timeit(f_x, v, loc, attn)*1e3:6.2f} ms  "
          f"pallas {timeit(f_p, v, loc, attn)*1e3:6.2f} ms", flush=True)

# depth sampling: (6, 704, 80) sampled at 4096*4 points
S = 4096 * 4
d = jnp.asarray(rng.rand(B, H * W, 80).astype(np.float32))
locd = jnp.asarray(rng.uniform(0, 1, (B, S, 2)).astype(np.float32))
f_x = jax.jit(lambda v, l: bilinear_sample_onehot(v, (H, W), l))
f_p = jax.jit(lambda v, l: bilinear_sample_pallas(v, (H, W), l))
ref = np.asarray(f_x(d, locd))
got = np.asarray(f_p(d, locd))
print(f"depth-sample: rel err {np.abs(got-ref).max()/np.abs(ref).max():.6f}  "
      f"xla {timeit(f_x, d, locd)*1e3:6.2f} ms  "
      f"pallas {timeit(f_p, d, locd)*1e3:6.2f} ms", flush=True)
