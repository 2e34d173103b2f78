"""TPU micro-benchmark: 3x3 conv formulations at the model's hot shapes.

Methodology: the op is chained N times inside ONE jit (output feeds the
next input, forcing sequential device execution), so the axon tunnel's
per-dispatch ~1-2 ms overhead is paid once, not N times.  Timing ends
with a 1-element host transfer (block_until_ready is a no-op over the
tunnel).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from fbbev_tpu.ops import pallas_conv

N = 20

SHAPES = [
    # (label, B, H, W, C) -- Cin == Cout so the op chains
    ("r50.l1", 6, 64, 176, 64),
    ("r50.l2", 6, 32, 88, 128),
    ("r50.l3", 6, 16, 44, 256),
    ("zslab.bev", 8, 100, 100, 256),
    ("zslab.occ", 16, 200, 200, 64),
]


def chain(op):
    @jax.jit
    def run(x, w):
        def body(i, y):
            return op(y, w).astype(x.dtype)
        return jax.lax.fori_loop(0, N, body, x)
    return run


def timeit(fn, *args):
    y = fn(*args)
    np.asarray(y.ravel()[0])  # sync
    t0 = time.perf_counter()
    y = fn(*args)
    np.asarray(y.ravel()[0])
    return (time.perf_counter() - t0) / N * 1e3


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def xla_im2col(x, w):
    B, H, W, Cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + H, dx:dx + W, :]
            for dy in range(3) for dx in range(3)]
    col = jnp.concatenate(cols, axis=-1)
    return col @ w.reshape(9 * Cin, -1)


def xla_shift(x, w):
    B, H, W, Cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            y = xp[:, dy:dy + H, dx:dx + W, :] @ w[dy, dx]
            out = y if out is None else out + y
    return out


def main():
    print("device:", jax.devices()[0], f"chain N={N}")
    for label, B, H, W, C in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(
            jnp.bfloat16)
        w = jnp.asarray(
            rng.randn(3, 3, C, C).astype(np.float32) * 0.05).astype(
            jnp.bfloat16)
        gflop = 2 * B * H * W * 9 * C * C / 1e9
        ref = np.asarray(xla_conv(x, w).astype(jnp.float32))
        line = f"{label:10s} {B}x{H}x{W}x{C}"
        for name, op in [
            ("xla", xla_conv),
            ("im2col", xla_im2col),
            ("shift", xla_shift),
            ("pl.k9", lambda x, w: pallas_conv.conv3x3_s1(x, w,
                                                          fuse_k=False)),
            ("pl.k1", lambda x, w: pallas_conv.conv3x3_s1(x, w,
                                                          fuse_k=True)),
        ]:
            try:
                got = np.asarray(op(x, w).astype(jnp.float32))
                err = float(np.max(np.abs(got - ref)))
                assert err < 1.0, err
                t = timeit(chain(op), x, w)
                line += f"  {name} {t:7.3f}ms {gflop / t:5.1f}TF"
            except Exception as e:  # noqa: BLE001
                line += f"  {name} FAIL({type(e).__name__})"
                err_txt = str(e).split("\n")[0][:160]
                print(f"  [{label}/{name}] {err_txt}", flush=True)
        print(line, flush=True)


if __name__ == "__main__":
    main()
