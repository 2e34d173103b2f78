#!/usr/bin/env python
"""int8 conv feasibility probe (VERDICT r3 #3a: the 2x PTQ lever).

Measures per-op DEVICE time (profile_trace methodology; wall-clock is
invalid over the axon tunnel) for the serving graph's dominant conv
shapes in bf16 vs int8 (s8 x s8 -> s32 on the v5e MXU at 2x bf16 peak),
including the quantize/dequantize overhead a real PTQ layer would pay.

Shapes from the round-4 serving ledger (/tmp/prof_serving_r4.txt):
  * z-slab inner 2D convs of the 3D BEV encoder (layers.py:173, 3.95 ms)
  * image-encoder R50 convs (flax linear.py, 2.93 ms)
"""
import sys

import numpy as np

sys.path.insert(0, ".")
from tools.profile_trace import profile_callable  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    shapes = [
        # (name, x-shape NHWC, kernel HWIO, strides)
        ("zslab100_c64", (8, 100, 100, 64), (3, 3, 64, 64), (1, 1)),
        ("zslab100_c160", (8, 100, 100, 160), (3, 3, 160, 64), (1, 1)),
        ("zslab50_c128", (4, 50, 50, 128), (3, 3, 128, 128), (1, 1)),
        ("r50_l1", (6, 64, 176, 256), (1, 1, 256, 64), (1, 1)),
        ("r50_l2_3x3", (6, 32, 88, 128), (3, 3, 128, 128), (1, 1)),
        ("r50_l3_3x3", (6, 16, 44, 256), (3, 3, 256, 256), (1, 1)),
        ("depthnet_3x3", (6, 16, 44, 512), (3, 3, 512, 512), (1, 1)),
    ]
    rng = np.random.RandomState(0)

    for name, xs, ks, st in shapes:
        x = jnp.asarray(rng.randn(*xs).astype(np.float32))
        w = jnp.asarray((rng.randn(*ks) * 0.05).astype(np.float32))

        def bf16_conv(x, w):
            return jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), st,
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # static int8 PTQ: per-tensor act scale, per-out-channel weight
        # scale; weights pre-quantized (host), act quant in-graph
        s_x = jnp.float32(3.0 / 127.0)
        w_q = jnp.clip(jnp.round(w / (jnp.max(jnp.abs(w), axis=(0, 1, 2),
                                              keepdims=True) / 127.0)),
                       -127, 127).astype(jnp.int8)
        s_w = (jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0)

        def int8_conv(x, w_q, s_w):
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                          -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, w_q, st, "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32)
                    * (s_x * s_w)).astype(jnp.bfloat16)

        f_bf = jax.jit(bf16_conv)
        f_i8 = jax.jit(int8_conv)
        try:
            _, tot_bf, _ = profile_callable(f_bf, (x, w), iters=20,
                                            trace_dir="/tmp/probe_tr_bf")
            _, tot_i8, _ = profile_callable(f_i8, (x, w_q, s_w), iters=20,
                                            trace_dir="/tmp/probe_tr_i8")
            flops = (2 * np.prod(xs) // xs[-1] * np.prod(ks)
                     / (st[0] * st[1]))
            print(f"{name:16s} bf16 {tot_bf:7.3f} ms ({flops/tot_bf/1e9:6.1f}"
                  f" TF/s)   int8 {tot_i8:7.3f} ms "
                  f"({flops/tot_i8/1e9:6.1f} TOP/s)  "
                  f"speedup {tot_bf/tot_i8:4.2f}x", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:16s} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
