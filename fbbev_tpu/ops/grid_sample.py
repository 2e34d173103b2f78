"""Bilinear / trilinear grid sampling, channels-last, XLA-native.

Replaces the reference's implicit uses of CUDA ``F.grid_sample``:

* 5-D align_corners=True warp of the temporal history volume
  (``/root/reference/mmdet3d/models/fbbev/detectors/fbocc.py:275``)
* align_corners=False bilinear sampling inside the mmcv
  ``ms_deform_attn`` CUDA kernel (the functional spec is
  ``mmcv.ops.multi_scale_deform_attn.multi_scale_deformable_attn_pytorch``).

Both are expressed as gather + lerp so autodiff provides the backward pass.
Out-of-bounds samples use zero padding (corner weights masked), matching
``padding_mode='zeros'``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """[-1, 1] -> pixel index coordinates (torch grid_sample convention)."""
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """img (B, H, W, C); ix/iy (B, ...) int32 -> (B, ..., C) with clipping."""
    B, H, W, C = img.shape
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    flat = img.reshape(B, H * W, C)
    idx = iyc * W + ixc
    return jnp.take_along_axis(
        flat, idx.reshape(B, -1, 1), axis=1
    ).reshape(*idx.shape, C)


def grid_sample_2d(img: jnp.ndarray, grid: jnp.ndarray,
                   align_corners: bool = False) -> jnp.ndarray:
    """Bilinear sample. img (B, H, W, C); grid (B, ..., 2) of (x, y) in [-1,1].

    Returns (B, ..., C).  Zero padding outside the image.
    """
    H, W = img.shape[1:3]
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def in_x(i):
        return (i >= 0) & (i <= W - 1)

    def in_y(i):
        return (i >= 0) & (i <= H - 1)

    out = 0.0
    for ix, iy, wgt in (
        (x0, y0, wx0 * wy0),
        (x1, y0, wx1 * wy0),
        (x0, y1, wx0 * wy1),
        (x1, y1, wx1 * wy1),
    ):
        w_masked = jnp.where(in_x(ix) & in_y(iy), wgt, 0.0)
        out = out + _gather_2d(img, ix, iy) * w_masked[..., None]
    return out


def grid_sample_3d(vol: jnp.ndarray, grid: jnp.ndarray,
                   align_corners: bool = True) -> jnp.ndarray:
    """Trilinear sample. vol (B, D, H, W, C); grid (B, ..., 3) of (x, y, z)
    in [-1, 1] where x indexes W, y indexes H, z indexes D (torch 5-D
    grid_sample convention).  Returns (B, ..., C); zero padding outside.
    """
    B, D, H, W, C = vol.shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)
    z = _unnormalize(grid[..., 2], D, align_corners)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1
    wx1, wy1, wz1 = x - x0, y - y0, z - z0
    wx0, wy0, wz0 = 1.0 - wx1, 1.0 - wy1, 1.0 - wz1

    flat = vol.reshape(B, D * H * W, C)

    def corner(ix, iy, iz, wgt):
        inside = (
            (ix >= 0) & (ix <= W - 1)
            & (iy >= 0) & (iy <= H - 1)
            & (iz >= 0) & (iz <= D - 1)
        )
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        izc = jnp.clip(iz, 0, D - 1)
        idx = (izc * H + iyc) * W + ixc
        vals = jnp.take_along_axis(
            flat, idx.reshape(B, -1, 1), axis=1
        ).reshape(*idx.shape, C)
        return vals * jnp.where(inside, wgt, 0.0)[..., None]

    out = (
        corner(x0, y0, z0, wx0 * wy0 * wz0)
        + corner(x1, y0, z0, wx1 * wy0 * wz0)
        + corner(x0, y1, z0, wx0 * wy1 * wz0)
        + corner(x1, y1, z0, wx1 * wy1 * wz0)
        + corner(x0, y0, z1, wx0 * wy0 * wz1)
        + corner(x1, y0, z1, wx1 * wy0 * wz1)
        + corner(x0, y1, z1, wx0 * wy1 * wz1)
        + corner(x1, y1, z1, wx1 * wy1 * wz1)
    )
    return out
