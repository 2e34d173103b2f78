#!/usr/bin/env python
"""Train an FB-BEV/FB-OCC model from a config file.

Usage (mirrors the reference CLI, ``/root/reference/tools/train.py:117``):

    python tools/train.py fbbev_tpu/configs/fbocc-r50-cbgs_depth_16f.py \
        --work-dir work_dirs/fbocc_r50 \
        --cfg-options optimizer.lr=1e-4 max_iters=100
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train an fbbev_tpu model")
    p.add_argument("config", help="config file path")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--devices", default=None,
                   help="mesh size: an int or 'all' (replaces the "
                        "reference's --launcher/dist_train.sh)")
    p.add_argument("--space", type=int, default=None,
                   help="camera/model-parallel mesh axis size")
    p.add_argument("--load-from", default=None,
                   help="warm-start checkpoint (.pth via converter or .npz)")
    p.add_argument("--load-img-from", default=None,
                   help="partial warm start: image backbone only "
                        "(reference tools/train.py:277-299)")
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="dotted key=value config overrides")
    return p.parse_args()


def main():
    args = parse_args()
    from fbbev_tpu.config import Config
    from fbbev_tpu.train.loop import train

    cfg = Config.fromfile(args.config)
    overrides = {}
    for kv in args.cfg_options:
        k, v = kv.split("=", 1)
        overrides[k] = v
    for flag in ("devices", "space", "load_from", "load_img_from"):
        v = getattr(args, flag)
        if v is not None:
            overrides[flag] = str(v)
    cfg.merge_from_options(overrides)
    train(cfg, max_iters=args.max_iters, work_dir=args.work_dir,
          resume=args.resume)


if __name__ == "__main__":
    main()
