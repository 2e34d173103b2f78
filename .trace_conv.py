"""Trace-profile chained conv formulations: per-op DEVICE time truth."""
import sys
sys.path.insert(0, "tools")

import numpy as np
import jax
import jax.numpy as jnp

from profile_trace import profile_callable
from fbbev_tpu.ops import pallas_conv

N = 20


def chain(op):
    @jax.jit
    def run(x, w):
        def body(i, y):
            return op(y, w).astype(x.dtype)
        return jax.lax.fori_loop(0, N, body, x)
    return run


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    label, B, H, W, C = "r50.l2", 6, 32, 88, 128
    if len(sys.argv) > 1 and sys.argv[1] == "bev":
        label, B, H, W, C = "zslab.bev", 8, 100, 100, 256
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(
        jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32) * 0.05).astype(
        jnp.bfloat16)
    for name, op in [("xla", xla_conv),
                     ("pl.k1", lambda x, w: pallas_conv.conv3x3_s1(x, w))]:
        module_ms, total, rows = profile_callable(chain(op), (x, w), iters=2)
        print(f"== {label} {name}: module {module_ms:.3f} ms/call, op-sum "
              f"{total:.3f} ({total / N:.3f} ms/conv)")
        for ms, cat, src in rows[:8]:
            print(f"  {ms:8.4f} ms  {cat:24s} {src[:70]}")


if __name__ == "__main__":
    main()
