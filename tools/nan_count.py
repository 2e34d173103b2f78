#!/usr/bin/env python
"""Count non-finite occ_logits in the eval forward (TPU-friendly probe).

FIDELITY_R4.json shows logit_abs_p99 = NaN for the f32 reference side at
flagship shape ON TPU, while the same configuration on CPU is clean
(tools/nan_probe.py).  On TPU the f32 eval path still runs the Pallas
kernels (sorted-slab pool, fused warp, one-hot sampling), so this probe
counts non-finite logits only (cheap to transfer over the axon tunnel)
and is meant to be run under the kernel env gates to isolate the source:

  python tools/nan_count.py                              # defaults
  FBBEV_POOL=xla python tools/nan_count.py
  FBBEV_DISABLE_FUSE_WARP=1 python tools/nan_count.py
  FBBEV_DISABLE_PALLAS_SAMPLE=1 python tools/nan_count.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--bn-warmup", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tools.fidelity import build, make_stream
    from fbbev_tpu.models.fbocc import init_temporal_state

    size = "small" if args.small else "flagship"
    model, grid = build(size, args.dtype)
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

    state = init_temporal_state(1, grid, model.history_cat_num, C)

    spatial = os.environ.get("FBBEV_NAN_SPATIAL") == "1"

    @jax.jit
    def stats(variables, batch, state):
        outputs, new_state = model.apply(variables, batch, state,
                                         train=False)
        lg = outputs["occ_logits"].astype(jnp.float32)
        nan = jnp.isnan(lg)
        out = (nan.sum(), jnp.isinf(lg).sum(),
               jnp.nanmax(jnp.abs(lg)),
               jnp.isnan(outputs["bev_refined"].astype(jnp.float32)).sum()
               if "bev_refined" in outputs else jnp.int32(-1))
        if spatial:
            # where are the NaNs?  (B, Y, X, Z, CLS) -> per-axis counts
            # discriminate producer stages: all-classes-NaN at shared
            # voxels = upstream of the logits conv; class-striped =
            # inside it; z-striped = upsample/conv z handling
            out = out + (nan.sum(axis=(0, 1, 2, 4)),   # per-Z
                         nan.sum(axis=(0, 1, 2, 3)),   # per-class
                         nan.all(-1).sum(),            # voxels all-NaN
                         nan.any(-1).sum(),            # voxels any-NaN
                         nan.sum(axis=(0, 2, 3, 4)),   # per-Y
                         )
        return out, new_state

    env = {k: v for k, v in os.environ.items() if k.startswith("FBBEV")}
    for i, b in enumerate(stream):
        vals, state = stats(variables, b, state)
        n_nan, n_inf, amax, bev_nan = vals[:4]
        rec = {
            "frame": i, "nan": int(np.asarray(n_nan)),
            "inf": int(np.asarray(n_inf)),
            "max_abs": float(np.asarray(amax)),
            "bev_refined_nan": int(np.asarray(bev_nan)),
            "env": env}
        if spatial:
            per_z, per_cls, all_nan, any_nan, per_y = vals[4:]
            rec["per_z"] = np.asarray(per_z).tolist()
            rec["per_class"] = np.asarray(per_cls).tolist()
            rec["voxels_all_nan"] = int(np.asarray(all_nan))
            rec["voxels_any_nan"] = int(np.asarray(any_nan))
            y = np.asarray(per_y)
            nz = np.flatnonzero(y)
            rec["y_nan_range"] = ([int(nz[0]), int(nz[-1])]
                                  if nz.size else None)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
