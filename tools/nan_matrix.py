#!/usr/bin/env python
"""Isolation matrix for the flagship f32 NaN on TPU (VERDICT r4 #1).

FIDELITY_R4 showed ~25% non-finite f32 occ_logits at flagship shape on
TPU (CPU clean, bev_refined clean).  Round-4 exonerated fuse_warp and
pallas_sample, but the STANDALONE pallas history-warp kernel and the
z-slab conv decomposition ran in every combo.  This driver runs
tools/nan_count.py under each isolation combo in a FRESH process
(serialized, timeout-bounded; a crashed worker poisons only its own
process) and appends one JSON line per combo.

  python tools/nan_matrix.py [--out /tmp/nan_matrix.jsonl]
"""

import argparse
import json
import os
import subprocess
import sys
import time

COMBOS = [
    # (name, env, extra nan_count args)
    ("baseline-f32", {}, []),
    # reproduce round-4's NaN combo: fused warp off -> the STANDALONE
    # Pallas warp (which ran gate-less in every r4 combo) takes over
    ("pallaswarp", {"FBBEV_DISABLE_FUSE_WARP": "1"}, []),
    # prime suspect isolation: BOTH Pallas warps off -> the pure-XLA
    # tiled warp.  bev_refined -- UPSTREAM of the warp -- was clean in
    # every r4 combo, so the warp is the first untested stage.
    ("xlawarp", {"FBBEV_DISABLE_FUSE_WARP": "1",
                 "FBBEV_DISABLE_PALLAS_WARP": "1"}, []),
    # the z-slab conv decomposition (the known v5e bad actor family)
    ("zfold", {"FBBEV_CONV3D": "zfold"}, []),
    # BN warm-up control: warmup TRAIN graphs also ran on TPU and could
    # have poisoned the batch_stats every combo shares
    ("nowarmup", {}, ["--bn-warmup", "0"]),
    # everything off: pure-XLA eval graph (no Pallas kernels, no z-slab)
    ("allxla", {"FBBEV_DISABLE_PALLAS_WARP": "1",
                "FBBEV_DISABLE_FUSE_WARP": "1",
                "FBBEV_DISABLE_PALLAS_SAMPLE": "1",
                "FBBEV_POOL": "xla",
                "FBBEV_CONV3D": "zfold"}, []),
    # the eval-only occ-head coarse-pred algebraic restructure landed in
    # the same round the NaN first appeared (commit 904118b, session 2)
    ("coarsepred0", {"FBBEV_OCC_COARSE_PRED": "0"}, []),
    # no conv decompositions at all: native XLA conv3d everywhere
    ("nodecomp", {"FBBEV_DISABLE_CONV_DECOMP":
                  "zslab,pointwise,deconv"}, []),
    # round-5 batch 2: z-slab pinned as the producer (zfold/allxla = 0
    # NaN); bisect by stride and price the shipped bf16 serving dtype
    ("s2zfold", {"FBBEV_CONV3D_S2": "zfold"}, []),
    ("s1zfold", {"FBBEV_CONV3D_S1": "zfold"}, []),
    ("bf16", {}, ["--dtype", "bfloat16"]),
    ("bf16-zfold", {"FBBEV_CONV3D": "zfold"}, ["--dtype", "bfloat16"]),
    ("spatial", {"FBBEV_NAN_SPATIAL": "1"}, []),
    # round-5 batch 3: stride-2 z-slab is the producer (s2zfold = 0 NaN,
    # batch 2) and s2->zfold is now the DEFAULT (layers.py).  Validate
    # the new default, run the complementary control (s1->zfold with s2
    # FORCED back to zslab -> expect NaN), and price the shipped bf16
    # serving dtype under the old routing.
    ("default-fixed", {}, []),
    ("s1zfold-s2zslab", {"FBBEV_CONV3D_S1": "zfold",
                         "FBBEV_CONV3D_S2": "zslab"}, []),
    ("bf16-oldzslab", {"FBBEV_CONV3D": "zslab"}, ["--dtype", "bfloat16"]),
    ("spatial-zslab", {"FBBEV_CONV3D": "zslab",
                       "FBBEV_NAN_SPATIAL": "1"}, []),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/nan_matrix.jsonl")
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    only = set(args.only.split(",")) if args.only else None

    with open(args.out, "a") as f:
        for name, env, extra in COMBOS:
            if only and name not in only:
                continue
            full_env = dict(os.environ)
            full_env.update(env)
            t0 = time.time()
            try:
                p = subprocess.run(
                    [sys.executable, "tools/nan_count.py"] + extra,
                    cwd=repo, env=full_env, capture_output=True,
                    text=True, timeout=args.timeout)
                rc = p.returncode
                frames = []
                for line in p.stdout.splitlines():
                    line = line.strip()
                    if line.startswith("{"):
                        try:
                            frames.append(json.loads(line))
                        except json.JSONDecodeError:
                            pass
                tail = (p.stdout + p.stderr)[-1200:] if not frames else None
            except subprocess.TimeoutExpired as e:
                rc, frames = 124, []
                tail = ((e.stdout or "") + (e.stderr or ""))[-1200:]
            rec = {"combo": name, "env": env, "args": extra, "rc": rc,
                   "elapsed_s": round(time.time() - t0, 1),
                   "frames": frames}
            if tail:
                rec["tail"] = tail
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(json.dumps({"combo": name, "rc": rc,
                              "elapsed_s": rec["elapsed_s"],
                              "nan": [fr.get("nan") for fr in frames]}),
                  flush=True)


if __name__ == "__main__":
    main()
