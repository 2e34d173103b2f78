#!/usr/bin/env python
"""Render occupancy predictions / GT to PNG (BEV top-down + z-slices).

Counterpart of the reference's ``tools/analysis_tools/vis_occupancy.py``:
takes a ``.npz`` with ``semantics`` (X, Y, Z int labels, CVPR frame) or a
checkpointed model + a sample index, and writes colour-coded images.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# nuScenes occupancy palette (RGB), class 0..16 + free
PALETTE = np.array([
    (0, 0, 0), (112, 128, 144), (220, 20, 60), (255, 127, 80),
    (255, 158, 0), (233, 150, 70), (255, 61, 99), (0, 0, 230),
    (47, 79, 79), (255, 140, 0), (255, 99, 71), (0, 207, 191),
    (175, 0, 75), (75, 0, 75), (112, 180, 60), (222, 184, 135),
    (0, 175, 0), (255, 255, 255),
], np.uint8)


def render_bev(occ: np.ndarray, free_class: int = 17) -> np.ndarray:
    """(X, Y, Z) labels -> (Y, X, 3) top-down image (highest non-free
    voxel wins)."""
    X, Y, Z = occ.shape
    img = np.full((X, Y), free_class, occ.dtype)
    for z in range(Z):  # low to high: higher voxels overwrite
        sl = occ[:, :, z]
        solid = sl != free_class
        img[solid] = sl[solid]
    img = np.clip(img, 0, len(PALETTE) - 1)
    return PALETTE[img].transpose(1, 0, 2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input", help=".npz with 'semantics' (CVPR frame)")
    p.add_argument("--out", default="occ_vis.png")
    p.add_argument("--z-slices", action="store_true",
                   help="also write per-z-slice images")
    args = p.parse_args()
    from PIL import Image

    data = np.load(args.input)
    occ = data["semantics"] if "semantics" in data else data[data.files[0]]
    img = render_bev(occ)
    Image.fromarray(img).resize(
        (img.shape[1] * 3, img.shape[0] * 3), Image.NEAREST).save(args.out)
    print(f"wrote {args.out} ({occ.shape})")
    if args.z_slices:
        base, ext = os.path.splitext(args.out)
        for z in range(occ.shape[2]):
            sl = np.clip(occ[:, :, z], 0, len(PALETTE) - 1)
            Image.fromarray(PALETTE[sl].transpose(1, 0, 2)).save(
                f"{base}_z{z}{ext}")
        print(f"wrote {occ.shape[2]} z-slices")


if __name__ == "__main__":
    main()
