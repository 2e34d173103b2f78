#!/usr/bin/env python
"""Localize non-finite values in the f32 flagship eval forward.

The fidelity harness (tools/fidelity.py) found NaN in the f32 reference
occ_logits at flagship shape (FIDELITY_R4.json: logit_abs_p99 = NaN) while
every per-stage ledger entry (depth/context/bev_refined) stayed finite --
so the first non-finite value appears in fuse_history / 3D encoder /
occ head.  This probe reruns the same configuration with flax
``capture_intermediates`` and reports, in module order, the first
intermediates containing non-finite entries.

Usage:
  python tools/nan_probe.py --cpu [--small] [--frames 2] [--bn-warmup 3]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--bn-warmup", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tools.fidelity import build, make_stream
    from fbbev_tpu.models.fbocc import init_temporal_state

    size = "small" if args.small else "flagship"
    model, grid = build(size, "float32")
    H, W = model.input_size
    stream = make_stream(np.random.RandomState(0), 1, model.num_cams, H, W,
                         args.frames)
    C = model.single_bev_num_channels
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), stream[0],
        init_temporal_state(1, grid, model.history_cat_num, C))

    if args.bn_warmup:
        @jax.jit
        def warm(variables, batch, state):
            (_, new_state), mut = model.apply(
                variables, batch, state, train=True,
                mutable=["batch_stats"])
            return new_state, mut["batch_stats"]

        for _ in range(args.bn_warmup):
            wst = init_temporal_state(1, grid, model.history_cat_num, C)
            for b in stream:
                wst, new_bs = warm(variables, b, wst)
                variables = {"params": variables["params"],
                             "batch_stats": new_bs}
    print("warmup done", flush=True)

    state = init_temporal_state(1, grid, model.history_cat_num, C)

    @jax.jit
    def step(variables, batch, state):
        (outputs, new_state), mods = model.apply(
            variables, batch, state, train=False,
            capture_intermediates=True)
        return outputs, new_state, mods["intermediates"]

    for i, b in enumerate(stream):
        out, state, inter = step(variables, b, state)
        flat = jax.tree_util.tree_flatten_with_path(inter)[0]
        bad = []
        for path, val in flat:
            if not hasattr(val, "dtype") or not jnp.issubdtype(
                    val.dtype, jnp.floating):
                continue
            a = np.asarray(val)
            n_nan = int(np.isnan(a).sum())
            n_inf = int(np.isinf(a).sum())
            amax = float(np.nanmax(np.abs(a))) if a.size else 0.0
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            if n_nan or n_inf or amax > 1e6:
                bad.append((name, val.shape, n_nan, n_inf, amax))
        print(f"=== frame {i}: {len(bad)} suspicious intermediates ===",
              flush=True)
        for name, shape, n_nan, n_inf, amax in bad:
            print(f"  {name} {shape} nan={n_nan} inf={n_inf} "
                  f"max_abs={amax:.3e}", flush=True)
        logits = np.asarray(out["occ_logits"], np.float32)
        print(f"  occ_logits nan={int(np.isnan(logits).sum())} "
              f"inf={int(np.isinf(logits).sum())} "
              f"max_abs={float(np.nanmax(np.abs(logits))):.3e}", flush=True)


if __name__ == "__main__":
    main()
