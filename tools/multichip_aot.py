#!/usr/bin/env python
"""Flagship-shape multichip scaling evidence: AOT compile-only.

Lowers + compiles the FULL flagship training step (R50, 6 cams, 256x704,
100x100x8 BEV, 16-frame history) over an 8-device mesh on the virtual-CPU
backend and reports compiled per-device flops vs the unsharded step —
nothing is executed, so flagship shapes are fine on a 1-core host; only
compile time is paid.

This is the reference's 16-GPU DDP scaling assumption
(``/root/reference/mmdet3d/apis/train.py:229-233``) checked at the HLO
level: a pure-data mesh must put ~1/n of the step's flops on each device.

Usage (dispatches a CPU-forced child exactly like the dryrun):
  python tools/multichip_aot.py [--out MULTICHIP_FLAGSHIP.json]
      [--data 8 --space 1] [--batch 8] [--small]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "MULTICHIP_FLAGSHIP.json"))
    ap.add_argument("--data", type=int, default=8)
    ap.add_argument("--space", type=int, default=1)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--small", action="store_true",
                    help="dryrun-sized model (smoke test of this tool)")
    args = ap.parse_args()

    if os.environ.get("FBBEV_AOT_CHILD"):
        _impl(args)
        return

    from __graft_entry__ import _host_cpu_fingerprint

    n = args.data * args.space
    env = dict(os.environ)
    # same child hygiene as __graft_entry__.dryrun_multichip: no axon code
    # in the child, local compiles only, host-keyed cache
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append(f"--xla_force_host_platform_device_count={n}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_PLATFORM_NAME", None)
    env["FBBEV_AOT_CHILD"] = "1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   f"/tmp/fbbev_xla_cache_local_{_host_cpu_fingerprint()}")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
        env=env, cwd=REPO, check=True)


def measure(data: int, space: int, batch: int, small: bool) -> dict:
    """Compile (never execute) the train step unsharded and over a
    (data, space) mesh; return the per-device compiled-flops report.
    Callable from tests (conftest already forces the virtual-CPU mesh)."""
    import time

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    import numpy as np  # noqa: F401
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _make_batch
    from fbbev_tpu.models import FBOCC
    from fbbev_tpu.models.fbocc import init_temporal_state
    from fbbev_tpu.parallel import (
        make_mesh, shard_batch, state_pspecs, use_mesh)
    from fbbev_tpu.train import Trainer

    B = batch
    if small:
        grid = {"x": (-40.0, 40.0, 4.0), "y": (-40.0, 40.0, 4.0),
                "z": (-1.0, 5.4, 1.6), "depth": (2.0, 42.0, 2.0)}
        C = 32
        model = FBOCC(grid_config=grid,
                      bevformer_grid_config={k: grid[k] for k in "xyz"},
                      input_size=(32, 96), num_cams=2, history_cat_num=2,
                      single_bev_num_channels=C, depth_channels=20,
                      backbone_depth=18, img_feat_channels=64,
                      depth_mid_channels=64, max_queries_per_cam=128,
                      history_cat_conv_out_channels=2 * C,
                      voxel_channels=(8, 16, 32), voxel_out_channels=16)
        H, W, occ = 32, 96, (40, 40, 8)
        grid_size = (20, 20, 4)
        hist_c = C
    else:
        model = FBOCC()  # flagship: R50, 6 cams, 256x704, 100x100x8, 16f
        H, W, occ = 256, 704, (200, 200, 16)
        grid_size = (100, 100, 8)
        hist_c = 80

    trainer = Trainer(model)
    batch = _make_batch(B, model.num_cams, H, W, with_gt=True,
                        occ_shape=occ)
    tstate = init_temporal_state(B, grid_size, model.history_cat_num,
                                 hist_c)

    # shapes only: init via eval_shape + zeros fill (nothing executes the
    # model; we only need correctly-shaped pytrees for lower())
    state_shape = jax.eval_shape(
        trainer.init_state, jax.random.PRNGKey(0), batch, tstate)
    state = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype)
        if hasattr(s, "shape") else s, state_shape)

    report = {"batch": B, "mesh": {"data": data, "space": space},
              "small": bool(small)}

    def compiled_flops(lowered, label):
        t0 = time.time()
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        report[label] = {"flops": flops,
                         "compile_s": round(time.time() - t0, 1)}
        print(f"{label}: flops={flops:.3e} "
              f"({report[label]['compile_s']}s compile)", flush=True)
        return flops

    # unsharded baseline
    print("lowering unsharded...", flush=True)
    lowered = trainer.train_step_lower(state, tstate, batch,
                                       do_history=True)
    f_unsharded = compiled_flops(lowered, "unsharded")

    # sharded
    mesh = make_mesh(data=data, space=space)
    with use_mesh(mesh):
        batch_sh = shard_batch(batch, mesh)
        tstate_sh = jax.device_put(
            tstate, jax.tree.map(
                lambda spec: NamedSharding(mesh, spec),
                state_pspecs(tstate)))
        state_sh = jax.device_put(state, NamedSharding(mesh, P()))
        print("lowering sharded...", flush=True)
        lowered_sh = trainer.train_step_lower(state_sh, tstate_sh,
                                              batch_sh, do_history=True)
        f_sharded = compiled_flops(lowered_sh, "sharded_per_device")

    report["per_device_ratio"] = round(f_sharded / f_unsharded, 4)
    report["ideal_ratio"] = round(1.0 / (data * space), 4)
    return report


def _impl(args):
    report = measure(args.data, args.space, args.batch, args.small)
    print(json.dumps({k: report[k] for k in
                      ("per_device_ratio", "ideal_ratio")}), flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
