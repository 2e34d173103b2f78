#!/usr/bin/env python
"""On-chip A/B matrix for the opt-in perf stack (VERDICT r3 item #1).

Runs bench.py under each env combo in a FRESH process (a crashed TPU
worker poisons only its own process), serialized (one chip), each
bounded by a timeout.  Writes one JSON line per combo to the output
file as it goes, so partial progress survives a wedged chip.

Usage: python tools/ab_matrix.py [--out /tmp/ab_results.jsonl]
"""

import argparse
import json
import os
import subprocess
import sys
import time

# train-step benchmark command (flagship config, 20 timed iters)
_TRAIN_CMD = ["tools/benchmark.py",
              "fbbev_tpu/configs/fbocc-r50-cbgs_depth_16f.py",
              "--train-step", "--iters", "20"]

# NOTE env semantics after the round-4 default flips: the default bench
# mode IS serving with the Pallas pool + fused warp; combos below opt
# pieces OUT (or select other modes) relative to that.
# Combo entries: (name, env) runs bench.py; (name, env, cmd) runs cmd.
COMBOS = [
    ("default", {}),  # serving + pallas pool + fused warp + int8 PTQ
    # int8-default-era A/Bs (round 4 session 4): head-conv impl under
    # int8 (zfold head convs are int8-eligible since _quant_zfold), and
    # the no-int8 reference point
    ("int8-zslabhead", {"FBBEV_OCCHEAD_CONV3D": "zslab"}),
    ("int8-nativehead", {"FBBEV_OCCHEAD_CONV3D": "native"}),
    ("noint8", {"FBBEV_INT8": "0"}),
    ("serving-xlapool", {"FBBEV_POOL": "xla"}),
    ("serving-nofusewarp", {"FBBEV_FUSE_WARP": "0"}),
    ("stream", {"FBBEV_BENCH_MODE": "stream"}),
    ("frame", {"FBBEV_BENCH_MODE": "frame"}),
    ("serving+occfuse", {"FBBEV_OCCFUSE": "1"}),
    # occ-fuse crash bisect (VERDICT r3 #2): the kernel faults the v5e
    # worker only inside the full graph; these isolate which co-resident
    # graph structure triggers it (z-slab decomposition is the known
    # bad actor from the training-graph family, docs/ROUND2.md)
    ("serving+occfuse+zfold", {"FBBEV_OCCFUSE": "1",
                               "FBBEV_CONV3D": "zfold"}),
    ("serving+occfuse+nozslab", {"FBBEV_OCCFUSE": "1",
                                 "FBBEV_DISABLE_CONV_DECOMP": "zslab"}),
    ("serving+occfuse+nofusewarp", {"FBBEV_OCCFUSE": "1",
                                    "FBBEV_FUSE_WARP": "0"}),
    ("serving+occfuse+xlapool", {"FBBEV_OCCFUSE": "1",
                                 "FBBEV_POOL": "xla"}),
    ("serving+zfold", {"FBBEV_CONV3D": "zfold"}),
    # static int8 PTQ for the serving convs (utils/quantize.py) -- the
    # v5e MXU's 2x lever; fidelity priced by tools/fidelity.py --int8
    ("serving+int8", {"FBBEV_INT8": "1"}),
    ("serving+int8+occfuse", {"FBBEV_INT8": "1", "FBBEV_OCCFUSE": "1"}),
    # occ-head-local z-slab avoidance: zfold/native ONLY in the occ head
    # (encoder keeps zslab) -- the surgical version of the zfold fix
    ("serving+occfuse+oczfold", {"FBBEV_OCCFUSE": "1",
                                 "FBBEV_OCCHEAD_CONV3D": "zfold"}),
    ("serving+occfuse+ocnative", {"FBBEV_OCCFUSE": "1",
                                  "FBBEV_OCCHEAD_CONV3D": "native"}),
    # round-5: bank the two round-4 built-but-unmeasured opt-ins
    # (VERDICT r4 weak #5): fuse_warp epilogue fusion and the one-pass
    # integer 3D upsample
    # price the int8 default against pure-bf16 at the current stack
    ("bf16only", {"FBBEV_INT8": "0"}),
    # fused occ-head tail kernel (ops/pallas_occ_tail.py): upsample +
    # blend + BN + relu + class matmul per VMEM row-band
    ("occtail", {"FBBEV_OCC_TAIL": "1"}),
    # image-trunk-only int8 became the DEFAULT after this combo won on
    # both axes (32.07 fps vs 31.37 all-conv; trained fidelity == bf16,
    # docs/ROUND5.md session 6).  It ran with the then-default zslab
    # head routing; "default" now additionally restores the zfold head.
    ("int8-imgonly", {"FBBEV_INT8_EXCLUDE_EXTRA":
                      "img_bev_encoder,occupancy_head"}),
    # the round-4 all-conv int8 config, for reference
    ("int8-bev", {"FBBEV_INT8_BEV": "1"}),
    # round-5: Pallas locality-tiled BEV self-attention (the XLA
    # grid-tiled path's ~3 ms slab/one-hot bucket, ops/pallas_selfattn.py)
    ("selfattn", {"FBBEV_PALLAS_SELFATTN": "1"}),
    # occ-head 3x3x3 eval routing (zslab default since queue G)
    ("zfoldhead", {"FBBEV_OCCHEAD_CONV3D": "zfold"}),
    ("epi", {"FBBEV_FUSE_WARP_EPI": "1"}),
    ("onepass", {"FBBEV_UPSAMPLE3D": "onepass"}),
    ("epi+onepass", {"FBBEV_FUSE_WARP_EPI": "1",
                     "FBBEV_UPSAMPLE3D": "onepass"}),
    # round-5 train-step A/Bs (VERDICT r4 #3): flagship train step,
    # B=1 synthetic, wall-clock steady state via tools/benchmark.py
    ("train-default", {}, _TRAIN_CMD),  # hist Lovasz since round 5
    ("train-lovaszsort", {"FBBEV_LOVASZ": "sort"}, _TRAIN_CMD),
    ("train-lovaszhist", {"FBBEV_LOVASZ": "hist"}, _TRAIN_CMD),
    ("train-poolvjp", {"FBBEV_POOL_VJP": "1"}, _TRAIN_CMD),
    ("train-lovaszhist+poolvjp", {"FBBEV_LOVASZ": "hist",
                                  "FBBEV_POOL_VJP": "1"}, _TRAIN_CMD),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ab_results.jsonl")
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--only", default=None,
                    help="comma-separated combo names to run")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    only = set(args.only.split(",")) if args.only else None

    with open(args.out, "a") as f:
        for combo in COMBOS:
            name, env = combo[0], combo[1]
            cmd = list(combo[2]) if len(combo) > 2 else ["bench.py"]
            if only and name not in only:
                continue
            full_env = dict(os.environ)
            full_env.update(env)
            t0 = time.time()
            try:
                p = subprocess.run(
                    [sys.executable] + cmd, cwd=repo, env=full_env,
                    capture_output=True, text=True, timeout=args.timeout)
                rc = p.returncode
                # bench prints ONE json line; find it
                value = None
                for line in p.stdout.splitlines():
                    line = line.strip()
                    if line.startswith("{") and "metric" in line:
                        try:
                            value = json.loads(line)
                        except json.JSONDecodeError:
                            pass
                tail = (p.stdout + p.stderr)[-1500:]
            except subprocess.TimeoutExpired as e:
                rc, value = 124, None
                tail = ((e.stdout or b"").decode(errors="replace")
                        + (e.stderr or b"").decode(errors="replace"))[-1500:]
            rec = {"combo": name, "env": env, "rc": rc,
                   "elapsed_s": round(time.time() - t0, 1),
                   "result": value}
            if value is None:
                rec["tail"] = tail
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(json.dumps({k: rec[k] for k in
                              ("combo", "rc", "elapsed_s", "result")}),
                  flush=True)


if __name__ == "__main__":
    main()
