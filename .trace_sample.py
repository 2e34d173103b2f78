"""Device-time comparison: XLA one-hot scan vs Pallas kernel for the
cross-attention deformable sampling, at flagship shapes."""
import sys
sys.path.insert(0, "tools")

import numpy as np
import jax
import jax.numpy as jnp

from profile_trace import profile_callable
from fbbev_tpu.ops.deform_attn import deformable_sample_attend
from fbbev_tpu.ops.pallas_sample import deformable_sample_attend_pallas

# flagship cross-attn shapes: B'=6 (batch*cams), Q=4096 rebatched queries,
# heads=8, P=8 points, value 16x44 map, C=80
B, Q, heads, P, H, W, C = 6, 4096, 8, 8, 16, 44, 80
hd = C // heads
rng = np.random.RandomState(0)
v = jnp.asarray(rng.randn(B, H * W, heads, hd).astype(np.float32)).astype(
    jnp.bfloat16)
loc = jnp.asarray(rng.rand(B, Q, heads, P, 2).astype(np.float32))
attn = jnp.asarray(rng.rand(B, Q, heads, P).astype(np.float32))


def xla_fn(v, loc, attn):
    return deformable_sample_attend(v, (H, W), loc, attn)


def pl_fn(v, loc, attn):
    return deformable_sample_attend_pallas(v, (H, W), loc, attn)


for name, fn in [("xla", xla_fn), ("pallas", pl_fn)]:
    try:
        err = float(jnp.max(jnp.abs(
            jax.jit(fn)(v, loc, attn) - jax.jit(xla_fn)(v, loc, attn))))
        module_ms, total, rows = profile_callable(
            jax.jit(fn), (v, loc, attn), iters=5)
        print(f"{name}: module {module_ms:.3f} ms  maxerr {err:.3g}")
        for ms, cat, src in rows[:5]:
            print(f"   {ms:7.3f}  {cat:20s} {src[:60]}")
    except Exception as e:  # noqa: BLE001
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")
