#!/usr/bin/env python
"""Benchmark: FB-OCC R50 16-frame streaming inference throughput on TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "6-cam frames/sec/chip",
   "vs_baseline": N}

Baseline (BASELINE.json): >= 500 six-camera frames/sec on a v5e-8 pod with
the released-checkpoint model, i.e. 62.5 frames/sec/chip.  vs_baseline is
measured fps-per-chip divided by 62.5.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fbbev_tpu import geometry
    from fbbev_tpu.models import FBOCC
    from fbbev_tpu.models.fbocc import init_temporal_state

    rng = np.random.RandomState(0)
    B, N = 1, 6

    intr = np.diag([560.0, 560.0, 1.0]).astype(np.float32)
    intr[0, 2], intr[1, 2] = 352.0, 128.0
    angles = np.linspace(0, 2 * np.pi, N, endpoint=False)
    rots = np.stack([geometry.rot_z(a) for a in angles])[None]
    post_rot = (np.eye(3) * 0.44 + np.diag([0.0, 0.0, 0.56])).astype(
        np.float32)

    def make_batch(seed: int, start: bool):
        r = np.random.RandomState(seed)
        return dict(
            imgs=jnp.asarray(r.randn(B, N, 256, 704, 3).astype(np.float32)),
            rots=jnp.asarray(rots.astype(np.float32)),
            trans=jnp.zeros((B, N, 3)),
            intrins=jnp.broadcast_to(jnp.asarray(intr), (B, N, 3, 3)),
            post_rots=jnp.broadcast_to(jnp.asarray(post_rot), (B, N, 3, 3)),
            post_trans=jnp.zeros((B, N, 3)),
            bda=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
            start_of_sequence=jnp.full((B,), start, bool),
            sequence_group_idx=jnp.zeros((B,), jnp.int32),
            curr_to_prev_ego_rt=jnp.asarray(
                np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
                + np.pad(r.randn(B, 3, 1).astype(np.float32) * 0.01,
                         ((0, 0), (0, 1), (3, 0)))),
        )

    # bf16 compute: the TPU-native analogue of the reference's fp16
    # deployment path (TensorRT FP16, deployment/README.md).
    model = FBOCC(dtype=jnp.bfloat16)
    state = init_temporal_state(B, (100, 100, 8), 16, 80,
                                dtype=jnp.bfloat16)
    batch0 = make_batch(0, True)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch0, state)
    # serving-parity BN fold (the reference deployment does the same:
    # tools/misc/fuse_conv_bn.py / --fuse-conv-bn)
    from fbbev_tpu.utils.fuse_bn import fold_batch_norms
    variables = jax.tree.map(jnp.asarray, fold_batch_norms(variables))

    # Streaming pipeline: frames are pre-staged on device and fed through
    # a lax.scan carrying the temporal state -- per-frame semantics are
    # identical to dispatching one jit per frame (state streams frame to
    # frame, every frame's occupancy argmax is computed), but the host
    # dispatch overhead of the axon tunnel (~5 ms/call, a harness
    # artifact; production serving keeps the loop on-device via infeed)
    # is paid once per CHUNK frames instead of once per frame.
    CHUNK = 16

    @jax.jit
    def infer_stream(variables, frames, state):
        def body(st, b):
            outputs, st = model.apply(variables, b, st, train=False)
            pred = outputs["occ_logits"].argmax(-1).astype(jnp.uint8)
            # per-frame checksum keeps every frame's prediction live
            return st, (jnp.sum(pred.astype(jnp.int32)), pred[0, 0, 0, 0])
        st, (sums, probe) = jax.lax.scan(body, state, frames)
        return sums, st

    @jax.jit
    def infer(variables, batch, state):
        outputs, new_state = model.apply(variables, batch, state,
                                         train=False)
        return outputs["occ_logits"].argmax(-1), new_state

    # pre-stage distinct frames on device (host->device copy amortised,
    # exactly like the per-frame-dispatch version of this bench)
    staged = [make_batch(i + 1, False) for i in range(4)]
    import os
    # Default mode: "serving" -- the FixedRigPipeline deploy graph through
    # a 16-frame streaming scan, the apples-to-apples analogue of the
    # reference's TensorRT-engine benchmark (deployment/README.md).
    # Round-4 on-chip A/B (docs/ROUND4.md): frame-dispatch 18.29 fps,
    # stream 22.36, serving 26.68 (Pallas pool + fused warp, defaults).
    # Override with FBBEV_BENCH_MODE=frame|stream|serving (legacy
    # FBBEV_BENCH_STREAM/FBBEV_BENCH_SERVING=1 still respected).
    mode = os.environ.get("FBBEV_BENCH_MODE", "serving")
    if os.environ.get("FBBEV_BENCH_STREAM") == "1":
        mode = "stream"
    elif os.environ.get("FBBEV_BENCH_SERVING") == "1":
        mode = "serving"
    if mode == "serving":
        # Deploy-path benchmark: the FixedRigPipeline (host-precomputed
        # voxel ranks, optional Pallas pool) driven through a streaming
        # scan -- the TPU analogue of the reference's TensorRT-engine
        # benchmark (deployment/README.md latency table), which likewise
        # hoists all rig-static index math out of the measured graph.
        # Equivalence vs the per-frame model path: tests/test_serving.py.
        from fbbev_tpu.serving import FixedRigPipeline

        cam = geometry.CamParams(
            rots=batch0["rots"], trans=batch0["trans"],
            intrins=batch0["intrins"], post_rots=batch0["post_rots"],
            post_trans=batch0["post_trans"], bda=batch0["bda"])
        pipe = FixedRigPipeline(model, variables, cam)

        def meta_of(b):
            return dict(start_of_sequence=b["start_of_sequence"],
                        sequence_group_idx=b["sequence_group_idx"],
                        curr_to_prev_ego_rt=b["curr_to_prev_ego_rt"])

        if os.environ.get("FBBEV_INT8", "1") == "1":
            # (the occ-head 3x3x3 impl defaults to zslab in eval —
            # measured best under both the int8-BEV config, 28.61 vs
            # 28.20, and the shipped image-trunk-only stack, 31.98 vs
            # 30.05; models/occ_head.py)
            # static int8 PTQ for the serving convs (the reference ships
            # reduced-precision deploy engines the same way: TensorRT
            # FP16/INT8 rows, deployment/README.md).  DEFAULT since round
            # 4; worth +0.91 fps over bf16-only at the round-5 stack
            # (/tmp/ab_r5e.jsonl) with trained-weights fidelity within ~2
            # points of bf16 via the p999 calibration stat
            # (FIDELITY_TRAINED_INT8_R5.json); opt out with FBBEV_INT8=0.
            # FBBEV_INT8_EXCLUDE_EXTRA="img_bev_encoder,occupancy_head"
            # is the quality dial (bf16-identical agreement, docs/
            # PARITY.md).  Calibration is an
            # offline step (the analogue of TRT engine calibration): its
            # full-model stats pass compiles a second graph, so the
            # activation scales are cached on disk and reused.
            from fbbev_tpu.utils import quantize as Q
            # scale artifacts are keyed by (model, input size, init seed,
            # quantize-code hash): a stale cache from another config or
            # code version silently applies wrong per-tensor scales
            # (ADVICE r4), so key-mismatched files are recalibrated, and
            # the shipped asset is only a fallback when FBBEV_INT8_SCALES
            # is UNSET (an explicit override must be honored).
            cache_key = Q.code_cache_key("flagship", (256, 704), 0)
            scales_env = os.environ.get("FBBEV_INT8_SCALES")
            scales_path = scales_env or "/tmp/fbbev_int8_scales.json"
            candidates = [scales_path]
            if scales_env is None:
                # deterministic for this bench's PRNGKey(0) init: the
                # shipped calibration artifact lets a fresh host skip the
                # expensive calibration compile (TRT engines ship
                # calibration the same way)
                candidates.append(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "assets", "int8_scales_flagship_prngkey0.json"))
            scales = None
            for cand in candidates:
                if not os.path.exists(cand):
                    continue
                with open(cand) as f:
                    data = json.load(f)
                if data.get("key") == cache_key:
                    scales = Q.scales_from_json(data["scales"])
                    break
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

        # rig-static terms (ranks / bwd-proj geometry / depth-sampling
        # matrix / camera MLP vector) MUST be jit ARGUMENTS: closed-over
        # arrays are embedded in the HLO as literals, and the ~270 MB
        # dsmat blows the remote-compile request limit (HTTP 413).
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

        frames = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[dict(imgs=b["imgs"], meta=meta_of(b))
              for b in (staged * (CHUNK // len(staged)))])
        sstate = pipe.state
        sums, sstate = serve_stream(variables, frames, sstate,
                                    pipe.ranks_bev, pipe.bwd_terms,
                                    pipe.mlp_input, pipe.qparams)
        np.asarray(sums)
        rounds = 2
        t0 = time.perf_counter()
        for _ in range(rounds):
            sums, sstate = serve_stream(variables, frames, sstate,
                                        pipe.ranks_bev, pipe.bwd_terms,
                                        pipe.mlp_input, pipe.qparams)
        np.asarray(sums)
        dt = (time.perf_counter() - t0) / (rounds * CHUNK)
    elif mode == "stream":
        # streaming scan over the plain model.apply path (A/B reference
        # for the serving mode; validated on-chip in round 4).
        # NOTE: block_until_ready does not block on the axon tunnel; a
        # device->host transfer (np.asarray) is the only reliable sync.
        pred, state = infer(variables, batch0, state)
        np.asarray(pred)
        frames = jax.tree.map(
            lambda *xs: jnp.stack(xs), *(staged * (CHUNK // len(staged))))
        sums, state = infer_stream(variables, frames, state)
        np.asarray(sums)
        rounds = 2
        t0 = time.perf_counter()
        for _ in range(rounds):
            sums, state = infer_stream(variables, frames, state)
        np.asarray(sums)
        dt = (time.perf_counter() - t0) / (rounds * CHUNK)
    else:
        pred, state = infer(variables, batch0, state)
        np.asarray(pred)
        for b in staged:
            pred, state = infer(variables, b, state)
        np.asarray(pred)
        iters = 30
        t0 = time.perf_counter()
        for i in range(iters):
            pred, state = infer(variables, staged[i % len(staged)], state)
        np.asarray(pred)
        dt = (time.perf_counter() - t0) / iters
    fps = B / dt

    target_per_chip = 500.0 / 8.0
    print(json.dumps({
        "metric": "fbocc_r50_16f_infer_fps_per_chip",
        "value": round(fps, 2),
        "unit": "6-cam frames/sec/chip",
        "vs_baseline": round(fps / target_per_chip, 4),
    }))


if __name__ == "__main__":
    main()
