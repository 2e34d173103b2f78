#!/usr/bin/env python
"""XLA device-time profiler: trace a jitted callable on TPU and aggregate
per-op device time by source location.

The TPU-native replacement for the reference's ad-hoc ``run_time``
decorator + benchmark scripts (``models/fbbev/utils/bricks.py:32-47``,
``tools/analysis_tools/benchmark*.py``): one trace of the real compiled
graph, attributed to framework source lines, instead of wall-clock stage
guesses distorted by dispatch overhead (~1 ms/call over the axon tunnel).

Usage:
    python tools/profile_trace.py              # flagship eval forward
    python tools/profile_trace.py --train      # training step
    python tools/profile_trace.py --batch 4
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def profile_callable(fn, args, iters: int = 3,
                     trace_dir: str = "/tmp/fbbev_trace"):
    """Run ``fn(*args)`` under the JAX profiler; return (total_ms, rows)
    where rows = [(ms_per_iter, category, source, op_name), ...]."""
    import numpy as np

    import jax

    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])  # sync (axon-safe)
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        raise RuntimeError("no trace produced")
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}

    agg = {}
    noname = {}
    total = 0.0
    module_ms = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pid_names.get(e.get("pid"), ""):
            continue
        args_d = e.get("args") or {}
        dur = e.get("dur", 0) / 1e3 / iters
        cat = args_d.get("hlo_category", "?")
        if cat == "?" and e.get("name", "").startswith("jit_"):
            module_ms += dur
            continue
        src = args_d.get("source", "?")
        src = src.replace("/root/repo/", "")
        if src == "?":
            # keep the HLO op name so unattributed time is actionable
            nm = e.get("name", "?")
            noname[(nm, cat)] = noname.get((nm, cat), 0.0) + dur
        key = (src, cat)
        agg[key] = agg.get(key, 0.0) + dur
        total += dur
    rows = sorted(((v, cat, src) for (src, cat), v in agg.items()),
                  reverse=True)
    nn_rows = sorted(((v, cat, nm) for (nm, cat), v in noname.items()),
                     reverse=True)
    return module_ms, total, rows, nn_rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train", action="store_true")
    p.add_argument("--serving", action="store_true",
                   help="profile the FixedRigPipeline deploy graph "
                        "(host ranks, folded BN; honours FBBEV_POOL / "
                        "FBBEV_FUSE_WARP / FBBEV_OCCFUSE etc.)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--dump-hlo", default=None,
                   help="write the optimized HLO text here (names like "
                        "reshape.146 in the unattributed list resolve "
                        "against it)")
    p.add_argument("--config", default=None,
                   help="build the model from a config file instead of "
                        "the hardcoded flagship (e.g. the VoVNet-99 "
                        "512x1408 config); input shapes follow the config")
    args = p.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from fbbev_tpu import geometry
    from fbbev_tpu.models.fbocc import init_temporal_state

    B, N = args.batch, 6
    if args.config is not None:
        from fbbev_tpu.config import Config
        from fbbev_tpu.train.loop import _grid_size, build_model

        cfg = Config.fromfile(args.config)
        model = build_model(cfg).clone(remat=args.train)
        H, W = model.input_size
        N = model.num_cams
        grid = _grid_size(model)
    else:
        from fbbev_tpu.models import FBOCC
        model = FBOCC(dtype=jnp.bfloat16, remat=args.train)
        H, W = 256, 704
        grid = (100, 100, 8)

    rng = np.random.RandomState(0)
    intr = np.diag([560. * W / 704., 560. * W / 704., 1.]).astype(
        np.float32)
    intr[0, 2], intr[1, 2] = W / 2., H / 2.
    rots = np.stack([geometry.rot_z(a) for a in np.linspace(
        0, 2 * np.pi, N, endpoint=False)])[None]
    batch = dict(
        imgs=jnp.asarray(rng.randn(B, N, H, W, 3).astype(np.float32)),
        rots=jnp.asarray(np.broadcast_to(rots, (B, N, 3, 3)).astype(
            np.float32)),
        trans=jnp.zeros((B, N, 3)),
        intrins=jnp.broadcast_to(jnp.asarray(intr), (B, N, 3, 3)),
        post_rots=jnp.broadcast_to(jnp.asarray(
            (np.eye(3) * 0.44 + np.diag([0, 0, .56])).astype(np.float32)),
            (B, N, 3, 3)),
        post_trans=jnp.zeros((B, N, 3)),
        bda=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        start_of_sequence=jnp.zeros((B,), bool),
        sequence_group_idx=jnp.zeros((B,), jnp.int32),
        curr_to_prev_ego_rt=jnp.broadcast_to(jnp.eye(4), (B, 4, 4)))
    tstate = init_temporal_state(B, grid, model.history_cat_num,
                                 model.single_bev_num_channels,
                                 dtype=model.dtype)

    if args.train:
        from fbbev_tpu.train import Trainer
        batch["gt_occupancy"] = jnp.zeros(
            (B, 2 * grid[0], 2 * grid[1], 16), jnp.int32)
        batch["gt_depth"] = jnp.zeros((B, N, H, W), jnp.float32)
        trainer = Trainer(model, donate_state=False)  # args reused
        # (donation would invalidate fargs across profiler iterations)
        state = trainer.init_state(jax.random.PRNGKey(0), batch, tstate)
        fn = lambda s, t, b: trainer.train_step(s, t, b)  # noqa: E731
        fargs = (state, tstate, batch)
    elif args.serving:
        from fbbev_tpu.serving import FixedRigPipeline
        from fbbev_tpu.utils.fuse_bn import fold_batch_norms
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch,
                                        tstate)
        variables = jax.tree.map(jnp.asarray, fold_batch_norms(variables))
        cam = geometry.CamParams(
            rots=batch["rots"], trans=batch["trans"],
            intrins=batch["intrins"], post_rots=batch["post_rots"],
            post_trans=batch["post_trans"], bda=batch["bda"])
        pipe = FixedRigPipeline(model, variables, cam)
        meta = dict(start_of_sequence=batch["start_of_sequence"],
                    sequence_group_idx=batch["sequence_group_idx"],
                    curr_to_prev_ego_rt=batch["curr_to_prev_ego_rt"])
        if os.environ.get("FBBEV_INT8") == "1":
            pipe.enable_int8([np.asarray(batch["imgs"])], [meta])

        # rig-static terms as ARGUMENTS (not closure): closed-over arrays
        # become HLO literals and the ~270 MB dsmat overflows the remote
        # compile request (HTTP 413)
        @jax.jit
        def fn(v, im, m, st, rb, bt, mi, qp):
            return pipe._infer_impl(v, im, m, st, rb, bt, mi, qp)
        fargs = (variables, batch["imgs"], meta, pipe.state,
                 pipe.ranks_bev, pipe.bwd_terms, pipe.mlp_input,
                 pipe.qparams)
    else:
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch,
                                        tstate)

        @jax.jit
        def fn(v, b, ts):
            return model.apply(v, b, ts, train=False, do_history=True)
        fargs = (variables, batch, tstate)

    if args.dump_hlo:
        compiled = fn.lower(*fargs).compile()
        with open(args.dump_hlo, "w") as f:
            f.write(compiled.as_text())
        print(f"optimized HLO -> {args.dump_hlo}")

    module_ms, total, rows, nn_rows = profile_callable(fn, fargs)
    print(f"\nmodule device time: {module_ms:.2f} ms/iter; "
          f"op-sum {total:.2f} ms/iter")
    print(f"{'ms':>8}  {'category':<16} source")
    for v, cat, src in rows[:args.top]:
        print(f"{v:8.3f}  {cat:<16} {src}")
    bycat = {}
    for v, cat, _ in rows:
        bycat[cat] = bycat.get(cat, 0.0) + v
    print("\nby category:")
    for cat, v in sorted(bycat.items(), key=lambda kv: -kv[1]):
        print(f"{v:8.3f}  {cat}")
    if nn_rows:
        print("\nunattributed ops (no source):")
        for v, cat, nm in nn_rows[:15]:
            print(f"{v:8.3f}  {cat:<16} {nm}")


if __name__ == "__main__":
    main()
