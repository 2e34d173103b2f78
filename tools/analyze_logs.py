#!/usr/bin/env python
"""Summarise / plot training logs.

Counterpart of ``tools/analysis_tools/analyze_logs.py``: reads the JSON
lines the train loop prints (or a CsvLogger csv) and reports loss trends;
``--plot`` writes a PNG.
"""

import argparse
import csv
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def load_rows(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("{"):
                rows.append(json.loads(line))
    if rows:
        return rows
    with open(path) as f:
        return [dict((k, float(v)) for k, v in r.items())
                for r in csv.DictReader(f)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log", help="train log (json-lines or csv)")
    p.add_argument("--keys", nargs="*", default=None)
    p.add_argument("--plot", default=None, help="output PNG path")
    args = p.parse_args()
    rows = load_rows(args.log)
    if not rows:
        sys.exit("no metric rows found")
    keys = args.keys or [k for k in rows[0]
                         if k.startswith("loss") or k == "grad_norm"]
    iters = [r.get("iter", i) for i, r in enumerate(rows)]
    print(f"{'key':28s} {'first':>10s} {'last':>10s} {'min':>10s} {'trend'}")
    for k in keys:
        vals = np.array([r[k] for r in rows if k in r], float)
        if not len(vals):
            continue
        trend = "down" if vals[-1] < vals[0] else "up"
        print(f"{k:28s} {vals[0]:10.4f} {vals[-1]:10.4f} "
              f"{vals.min():10.4f} {trend}")
    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 5))
        for k in keys:
            vals = [r[k] for r in rows if k in r]
            ax.plot(iters[: len(vals)], vals, label=k)
        ax.set_xlabel("iteration")
        ax.set_yscale("log")
        ax.legend(fontsize=7)
        fig.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
