#!/usr/bin/env python
"""Config-general serving benchmark: the FixedRigPipeline deploy graph
driven through a streaming scan, for ANY model config.

This is the generalisation of the repo-root ``bench.py`` (the driver's
flagship metric, kept byte-stable on purpose) to arbitrary configs --
built for the VoVNet-99 @512x1408 scale target (BASELINE config #4,
reference ``occupancy_configs/fb_occ/fbocc-vov99_depth_16f*.py``) but
config-agnostic.  Mirrors the reference's TensorRT-engine benchmark
(``/root/reference/deployment/README.md`` latency table): rig-static
index math hoisted out of the measured graph, reduced-precision engine,
per-frame streaming semantics.

Usage:
    python tools/serving_bench.py fbbev_tpu/configs/fbocc-vov99_depth_16f_512x1408.py
    python tools/serving_bench.py <config> --no-int8   # bf16 engine
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--chunk", type=int, default=16,
                   help="frames per streaming-scan dispatch")
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--no-int8", action="store_true",
                   help="skip int8 PTQ (bf16 engine)")
    p.add_argument("--scales", default=None,
                   help="int8 activation-scale artifact path (default: "
                        "/tmp/fbbev_int8_scales_<config>.json, "
                        "recalibrated on key mismatch)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fbbev_tpu import geometry
    from fbbev_tpu.config import Config
    from fbbev_tpu.models.fbocc import init_temporal_state
    from fbbev_tpu.serving import FixedRigPipeline
    from fbbev_tpu.train.loop import _grid_size, build_model
    from fbbev_tpu.utils.fuse_bn import fold_batch_norms

    tag = os.path.splitext(os.path.basename(args.config))[0]
    cfg = Config.fromfile(args.config)
    model = build_model(cfg)
    B, N = 1, model.num_cams
    H, W = model.input_size
    grid = _grid_size(model)

    rng = np.random.RandomState(0)
    intr = np.diag([560. * W / 704., 560. * W / 704., 1.]).astype(
        np.float32)
    intr[0, 2], intr[1, 2] = W / 2., H / 2.
    rots = np.stack([geometry.rot_z(a) for a in np.linspace(
        0, 2 * np.pi, N, endpoint=False)])[None]
    post_rot = (np.eye(3) * 0.44 + np.diag([0., 0., .56])).astype(
        np.float32)

    def make_batch(seed: int, start: bool):
        r = np.random.RandomState(seed)
        return dict(
            imgs=jnp.asarray(r.randn(B, N, H, W, 3).astype(np.float32)),
            rots=jnp.asarray(np.broadcast_to(rots, (B, N, 3, 3)).astype(
                np.float32)),
            trans=jnp.zeros((B, N, 3)),
            intrins=jnp.broadcast_to(jnp.asarray(intr), (B, N, 3, 3)),
            post_rots=jnp.broadcast_to(jnp.asarray(post_rot),
                                       (B, N, 3, 3)),
            post_trans=jnp.zeros((B, N, 3)),
            bda=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
            start_of_sequence=jnp.full((B,), start, bool),
            sequence_group_idx=jnp.zeros((B,), jnp.int32),
            curr_to_prev_ego_rt=jnp.asarray(
                np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
                + np.pad(r.randn(B, 3, 1).astype(np.float32) * 0.01,
                         ((0, 0), (0, 1), (3, 0)))),
        )

    batch0 = make_batch(0, True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch0,
                                    init_temporal_state(
                                        B, grid, model.history_cat_num,
                                        model.single_bev_num_channels,
                                        dtype=model.dtype))
    variables = jax.tree.map(jnp.asarray, fold_batch_norms(variables))

    cam = geometry.CamParams(
        rots=batch0["rots"], trans=batch0["trans"],
        intrins=batch0["intrins"], post_rots=batch0["post_rots"],
        post_trans=batch0["post_trans"], bda=batch0["bda"])
    pipe = FixedRigPipeline(model, variables, cam)

    def meta_of(b):
        return dict(start_of_sequence=b["start_of_sequence"],
                    sequence_group_idx=b["sequence_group_idx"],
                    curr_to_prev_ego_rt=b["curr_to_prev_ego_rt"])

    staged = [make_batch(i + 1, False) for i in range(4)]

    if not args.no_int8:
        # occ-head conv impl under int8: measured on flagship
        # (docs/ROUND4.md session 4) -- keep parity with bench.py
        os.environ.setdefault("FBBEV_OCCHEAD_CONV3D", "zslab")
        from fbbev_tpu.utils import quantize as Q
        cache_key = Q.code_cache_key(tag, (H, W), 0)
        scales_path = args.scales or f"/tmp/fbbev_int8_scales_{tag}.json"
        scales = None
        if os.path.exists(scales_path):
            with open(scales_path) as f:
                data = json.load(f)
            if data.get("key") == cache_key:
                scales = Q.scales_from_json(data["scales"])
        if scales is not None:
            pipe.qparams = Q.build_qparams(variables, scales)
        else:
            pipe.enable_int8(
                [np.asarray(b["imgs"]) for b in (batch0, staged[0])],
                [meta_of(b) for b in (batch0, staged[0])])
            with open(scales_path, "w") as f:
                json.dump({"key": cache_key,
                           "scales": Q.scales_to_json(
                               pipe._int8_scales)}, f)

    # rig-static terms as jit ARGUMENTS (closure literals overflow the
    # remote-compile request -- see bench.py)
    @jax.jit
    def serve_stream(variables, frames, state, ranks_bev, bwd_terms,
                     mlp_input, qparams):
        def body(st, fr):
            pred, st = pipe._infer_impl(
                variables, fr["imgs"], fr["meta"], st, ranks_bev,
                bwd_terms, mlp_input, qparams)
            return st, jnp.sum(pred)
        st, sums = jax.lax.scan(body, state, frames)
        return sums, st

    CHUNK = args.chunk
    frames = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[dict(imgs=b["imgs"], meta=meta_of(b))
          for b in (staged * (CHUNK // len(staged)))])
    sstate = pipe.state
    sums, sstate = serve_stream(variables, frames, sstate, pipe.ranks_bev,
                                pipe.bwd_terms, pipe.mlp_input,
                                pipe.qparams)
    np.asarray(sums)  # sync (block_until_ready is a no-op on axon)
    t0 = time.perf_counter()
    for _ in range(args.rounds):
        sums, sstate = serve_stream(variables, frames, sstate,
                                    pipe.ranks_bev, pipe.bwd_terms,
                                    pipe.mlp_input, pipe.qparams)
    np.asarray(sums)
    dt = (time.perf_counter() - t0) / (args.rounds * CHUNK)
    print(json.dumps({
        "metric": f"{tag}_serving_fps_per_chip",
        "value": round(B / dt, 2),
        "unit": f"{N}-cam frames/sec/chip",
        "latency_ms": round(dt * 1e3, 2),
        "int8": not args.no_int8,
    }))


if __name__ == "__main__":
    main()
