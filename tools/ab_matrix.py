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

# NOTE env semantics after the round-4 default flips: the default bench
# mode IS serving with the Pallas pool + fused warp; combos below opt
# pieces OUT (or select other modes) relative to that.
COMBOS = [
    ("default", {}),  # serving + pallas pool + fused warp
    ("serving-xlapool", {"FBBEV_POOL": "xla"}),
    ("serving-nofusewarp", {"FBBEV_FUSE_WARP": "0"}),
    ("stream", {"FBBEV_BENCH_MODE": "stream"}),
    ("frame", {"FBBEV_BENCH_MODE": "frame"}),
    ("serving+occfuse", {"FBBEV_OCCFUSE": "1"}),
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
        for name, env in COMBOS:
            if only and name not in only:
                continue
            full_env = dict(os.environ)
            full_env.update(env)
            t0 = time.time()
            try:
                p = subprocess.run(
                    [sys.executable, "bench.py"], cwd=repo, env=full_env,
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
