#!/usr/bin/env python
"""Serialized on-chip A/B matrix over the opt-in perf features.

Each config runs `python bench.py` in its OWN subprocess (a crashed v5e
worker poisons only that process) with a hard timeout.  Results append to
.ab_results.jsonl.  A bounded matmul probe runs first; if the chip lease
is wedged the script exits 3 without queueing anything.

Usage: python .ab_bench.py [--quick]
"""

import json
import os
import subprocess
import sys
import time

PROBE = (
    "import jax, jax.numpy as jnp, numpy as np;"
    "print('probe', np.asarray(jnp.ones((256,256), jnp.bfloat16) @"
    " jnp.ones((256,256), jnp.bfloat16))[0,0])"
)

CONFIGS = [
    ("baseline", {}),
    ("stream", {"FBBEV_BENCH_STREAM": "1"}),
    ("serving", {"FBBEV_BENCH_SERVING": "1"}),
    ("serving+pool", {"FBBEV_BENCH_SERVING": "1",
                      "FBBEV_POOL": "pallas"}),
    ("serving+pool+fusewarp", {"FBBEV_BENCH_SERVING": "1",
                               "FBBEV_POOL": "pallas",
                               "FBBEV_FUSE_WARP": "1"}),
    ("serving+pool+fusewarp+occfuse", {"FBBEV_BENCH_SERVING": "1",
                                       "FBBEV_POOL": "pallas",
                                       "FBBEV_FUSE_WARP": "1",
                                       "FBBEV_OCCFUSE": "1"}),
    ("serving+pool+fusewarp+conv3d", {"FBBEV_BENCH_SERVING": "1",
                                      "FBBEV_POOL": "pallas",
                                      "FBBEV_FUSE_WARP": "1",
                                      "FBBEV_CONV3D": "pallas"}),
    ("stream+fusewarp", {"FBBEV_BENCH_STREAM": "1",
                         "FBBEV_FUSE_WARP": "1"}),
    ("serving+pool+bf16pool", {"FBBEV_BENCH_SERVING": "1",
                               "FBBEV_POOL_DTYPE": "bf16"}),
]


def main():
    out_path = ".ab_results.jsonl"
    try:
        rc = subprocess.run([sys.executable, "-c", PROBE], timeout=180,
                            capture_output=True, text=True)
        if rc.returncode != 0:
            print("probe failed:", rc.stderr[-500:])
            return 3
    except subprocess.TimeoutExpired:
        print("probe TIMEOUT: chip lease wedged")
        return 3
    print("probe ok")

    configs = CONFIGS[:2] if "--quick" in sys.argv else CONFIGS
    for name, env in configs:
        e = dict(os.environ)
        e.update(env)
        t0 = time.time()
        try:
            rc = subprocess.run([sys.executable, "bench.py"], env=e,
                                timeout=900, capture_output=True, text=True)
            line = rc.stdout.strip().splitlines()
            parsed = None
            for ln in reversed(line):
                if ln.startswith("{"):
                    parsed = json.loads(ln)
                    break
            rec = {"config": name, "env": env, "rc": rc.returncode,
                   "wall_s": round(time.time() - t0, 1), "result": parsed}
            if rc.returncode != 0:
                rec["stderr_tail"] = rc.stderr[-800:]
        except subprocess.TimeoutExpired:
            rec = {"config": name, "env": env, "rc": "timeout",
                   "wall_s": round(time.time() - t0, 1), "result": None}
        print(json.dumps(rec), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if rec["rc"] == "timeout":
            print("bench timed out -- chip likely wedged again; stopping")
            return 4
    return 0


if __name__ == "__main__":
    sys.exit(main())
