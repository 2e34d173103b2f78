#!/usr/bin/env python
"""Render 3D detections as a BEV image (boxes over the occupancy grid).

Counterpart of the reference's bbox drawing utilities
(``models/fbbev/utils/draw_bbox.py`` / ``tools/analysis_tools/visual.py``).
Input: an .npz with ``boxes`` (N, >=7), ``scores`` (N,), ``labels`` (N,)
in ego coordinates, optional ``gt_boxes``/``gt_labels``.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def draw_boxes(draw, boxes, color, pc_range, scale, width=2):
    import jax.numpy as jnp

    from fbbev_tpu.ops.boxes import boxes_bev_corners
    if len(boxes) == 0:
        return
    corners = np.asarray(boxes_bev_corners(jnp.asarray(boxes)))
    for quad in corners:
        pts = [(float((x - pc_range[0]) * scale),
                float((y - pc_range[1]) * scale)) for x, y in quad]
        draw.polygon(pts, outline=color, width=width)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input", help=".npz with boxes/scores/labels")
    p.add_argument("--out", default="bbox_vis.png")
    p.add_argument("--score-thresh", type=float, default=0.3)
    p.add_argument("--extent", type=float, default=40.0)
    p.add_argument("--px-per-m", type=float, default=8.0)
    args = p.parse_args()
    from PIL import Image, ImageDraw

    data = np.load(args.input)
    size = int(2 * args.extent * args.px_per_m)
    img = Image.new("RGB", (size, size), (30, 30, 30))
    draw = ImageDraw.Draw(img)
    pc_range = (-args.extent, -args.extent)
    # ego marker
    c = size // 2
    draw.ellipse([c - 4, c - 4, c + 4, c + 4], fill=(255, 255, 255))

    if "gt_boxes" in data:
        draw_boxes(draw, data["gt_boxes"], (0, 255, 0), pc_range,
                   args.px_per_m)
    boxes = data["boxes"]
    keep = data["scores"] >= args.score_thresh
    draw_boxes(draw, boxes[keep], (255, 80, 80), pc_range, args.px_per_m)
    img.save(args.out)
    print(f"wrote {args.out}: {int(keep.sum())} predictions"
          + (f", {len(data['gt_boxes'])} GT" if "gt_boxes" in data else ""))


if __name__ == "__main__":
    main()
