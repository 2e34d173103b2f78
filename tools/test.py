#!/usr/bin/env python
"""Evaluate a trained model: streaming occupancy mIoU over the val split.

Usage (mirrors ``/root/reference/tools/test.py``):

    python tools/test.py fbbev_tpu/configs/fbocc-r50-cbgs_depth_16f.py \
        --work-dir work_dirs/fbocc_r50 [--max-samples 100] [--no-ema]
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate an fbbev_tpu model")
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--out-csv", default=None,
                   help="append per-class IoU to a results.csv")
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from fbbev_tpu.config import Config
    from fbbev_tpu.train.loop import evaluate

    cfg = Config.fromfile(args.config)
    overrides = {}
    for kv in args.cfg_options:
        k, v = kv.split("=", 1)
        overrides[k] = v
    cfg.merge_from_options(overrides)

    results = evaluate(cfg, max_samples=args.max_samples,
                       use_ema=not args.no_ema, work_dir=args.work_dir)
    for k, v in results.items():
        print(f"{k}: {v}")
    if args.out_csv:
        write_header = not os.path.exists(args.out_csv)
        with open(args.out_csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(results))
            if write_header:
                w.writeheader()
            w.writerow(results)


if __name__ == "__main__":
    main()
