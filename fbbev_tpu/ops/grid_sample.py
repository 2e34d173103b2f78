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

import jax
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


def grid_sample_3d_tiled(vol: jnp.ndarray, grid: jnp.ndarray,
                         align_corners: bool = True, tile: int = 4,
                         slab_xy: int = 8,
                         slab_z: int | None = None) -> jnp.ndarray:
    """Locality-tiled trilinear sampling for smooth (affine-like) grids.

    Exact-trilinear replacement for :func:`grid_sample_3d` on warps whose
    sample locations are spatially smooth (the temporal ego-motion warp of
    ``fbocc.py:275``): instead of 8 random row-gathers per output voxel
    (~15 GB/s effective on TPU), output is processed in (tile x tile x D)
    blocks, each block's source bounding slab is fetched with one sliced
    gather, and interpolation becomes a local one-hot matmul on the MXU.

    Correctness domain: each block's samples must fit a
    ``slab_z x slab_xy x slab_xy`` slab around their minimum corner.  For
    the BEV history warp (rotation <= 45 deg, |scale|=1, small pitch/roll)
    tile=4/slab 8/4 always suffices.  Out-of-volume samples get zero
    (grid_sample parity); samples outside the slab (grid too rough for the
    tile size) are clamped -- use plain grid_sample_3d for arbitrary grids.
    """
    B, D, H, W, C = vol.shape
    assert grid.shape[:4] == (B, D, H, W), (grid.shape, vol.shape)
    assert H % tile == 0 and W % tile == 0
    if slab_z is None:
        slab_z = D  # z' varies with output z across the whole depth range
    Ht, Wt = H // tile, W // tile
    T = Ht * Wt
    S = slab_z * slab_xy * slab_xy
    n_out = D * tile * tile

    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)
    z = _unnormalize(grid[..., 2], D, align_corners)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)

    def to_tiles(a):
        # (B, D, H, W) -> (B, T, D*tile*tile)
        a = a.reshape(B, D, Ht, tile, Wt, tile)
        return jnp.transpose(a, (0, 2, 4, 1, 3, 5)).reshape(B, T, n_out)

    xt, yt, zt = to_tiles(x), to_tiles(y), to_tiles(z)
    x0t, y0t, z0t = to_tiles(x0), to_tiles(y0), to_tiles(z0)

    # slab origin per tile: min corner, clamped inside the volume
    sx = jnp.clip(jnp.min(x0t, -1), 0, max(W - slab_xy, 0))
    sy = jnp.clip(jnp.min(y0t, -1), 0, max(H - slab_xy, 0))
    sz = jnp.clip(jnp.min(z0t, -1), 0, max(D - slab_z, 0))

    # fetch slabs: (B, T, slab_z, slab_xy, slab_xy, C)
    starts = jnp.stack([sz, sy, sx], -1)  # (B, T, 3)

    def fetch(vol_b, starts_b):
        def one(s):
            return jax.lax.dynamic_slice(
                vol_b, (s[0], s[1], s[2], 0),
                (slab_z, slab_xy, slab_xy, C))
        return jax.vmap(one)(starts_b)

    slabs = jax.vmap(fetch)(vol, starts)  # (B,T,sz,sy,sx,C)
    slabs = slabs.reshape(B, T, S, C)

    # local coords + one-hot interpolation matrix (8 corners folded)
    lx = xt - sx[..., None]
    ly = yt - sy[..., None]
    lz = zt - sz[..., None]
    lx0 = x0t - sx[..., None]
    ly0 = y0t - sy[..., None]
    lz0 = z0t - sz[..., None]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, S), 3)
    oh = jnp.zeros((B, T, n_out, S), vol.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                gxi = x0t + dx
                gyi = y0t + dy
                gzi = z0t + dz
                inside = (
                    (gxi >= 0) & (gxi <= W - 1) & (gyi >= 0)
                    & (gyi <= H - 1) & (gzi >= 0) & (gzi <= D - 1))
                w = ((1 - jnp.abs(lx - (lx0 + dx)))
                     * (1 - jnp.abs(ly - (ly0 + dy)))
                     * (1 - jnp.abs(lz - (lz0 + dz))))
                lxi = jnp.clip(lx0 + dx, 0, slab_xy - 1)
                lyi = jnp.clip(ly0 + dy, 0, slab_xy - 1)
                lzi = jnp.clip(lz0 + dz, 0, slab_z - 1)
                idx = (lzi * slab_xy + lyi) * slab_xy + lxi
                oh = oh + ((iota == idx[..., None])
                           * jnp.where(inside, w, 0.0)[..., None]
                           ).astype(vol.dtype)
    out = jnp.einsum("btsv,btvc->btsc", oh, slabs)
    out = out.reshape(B, Ht, Wt, D, tile, tile, C)
    return jnp.transpose(out, (0, 3, 1, 4, 2, 5, 6)).reshape(
        B, D, H, W, C)


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
