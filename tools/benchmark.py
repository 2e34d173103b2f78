#!/usr/bin/env python
"""Inference throughput benchmark for any config (cf. the reference's
``tools/analysis_tools/benchmark.py``).  ``bench.py`` at the repo root is
the driver-facing flagship wrapper; this tool benchmarks arbitrary configs
and batch sizes and can dump per-stage timings.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?",
                   default="fbbev_tpu/configs/fbocc-r50-cbgs_depth_16f.py")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--train-step", action="store_true",
                   help="benchmark the training step instead of inference")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from fbbev_tpu.config import Config
    from fbbev_tpu.data import SyntheticClipDataset, collate
    from fbbev_tpu.models.fbocc import init_temporal_state
    from fbbev_tpu.train import Trainer
    from fbbev_tpu.train.loop import _grid_size, build_model

    cfg = Config.fromfile(args.config)
    model = build_model(cfg)
    B = args.batch_size
    ds = SyntheticClipDataset(
        n_scenes=max(B, 2), frames_per_scene=8,
        input_size=model.input_size, num_cams=model.num_cams,
        occ_shape=tuple(
            2 * g for g in _grid_size(model)[:2]) + (16,))
    grid = _grid_size(model)
    tstate = init_temporal_state(B, grid, model.history_cat_num,
                                 model.single_bev_num_channels,
                                 dtype=model.dtype)
    batch = {k: jnp.asarray(v)
             for k, v in collate([ds[i * 8] for i in range(B)]).items()}

    trainer = Trainer(model)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, tstate)

    if args.train_step:
        step = lambda s, t, b: trainer.train_step(s, t, b)[0:2]
        state, tstate = step(state, tstate, batch)
        np.asarray(jax.tree.leaves(state.params)[0])  # sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, tstate = step(state, tstate, batch)
        np.asarray(jax.tree.leaves(state.params)[0])
        name = "train_step"
    else:
        outputs, tstate = trainer.eval_step(state, tstate, batch)
        np.asarray(list(outputs.values())[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            outputs, tstate = trainer.eval_step(state, tstate, batch)
        np.asarray(jax.tree.leaves(outputs)[0])
        name = "inference"
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": f"{name}_latency_ms", "value": round(dt * 1e3, 2),
        "batch_size": B,
        "frames_per_sec": round(B / dt, 2),
    }))


if __name__ == "__main__":
    main()
