"""Multi-scale deformable attention sampling as XLA gather + lerp.

Functional spec: mmcv's ``multi_scale_deformable_attn_pytorch`` (the pure
fallback referenced by the reference at
``/root/reference/mmdet3d/models/fbbev/view_transformation/backward_projection/bevformer_utils/spatial_cross_attention_depth.py:7,597``):
per level, ``F.grid_sample(value_l, 2*loc - 1, align_corners=False,
padding_mode='zeros')`` followed by the attention-weighted sum over
(levels x points).

On TPU the bilinear gather runs over tiny feature maps (16x44 for the
FB-OCC R50 config), so an XLA gather formulation is adequate; a Pallas
one-hot-matmul kernel is the planned upgrade for the serving path.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from fbbev_tpu.ops.grid_sample import grid_sample_2d


_CORNERS = ((0, 0), (1, 0), (0, 1), (1, 1))


def _bilinear_corners(loc: jnp.ndarray, H: int, W: int):
    """grid_sample(align_corners=False) corner indices/weights for locs in
    [0,1].  Returns a list of (idx (..., ), weight (...,)) with idx
    pre-clipped and weight zeroed outside the map."""
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    out = []
    for dx, dy in _CORNERS:
        xi, yi = x0 + dx, y0 + dy
        w = (1.0 - jnp.abs(x - xi)) * (1.0 - jnp.abs(y - yi))
        ok = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        out.append((idx, jnp.where(ok, w, 0.0)))
    return out


def bilinear_sample_onehot(value: jnp.ndarray, spatial_shape: Tuple[int, int],
                           loc: jnp.ndarray,
                           chunk: int = 8192,
                           remat: bool = False) -> jnp.ndarray:
    """Bilinear sampling as a one-hot matmul (MXU) instead of gathers.

    TPU gathers run at a tiny fraction of HBM bandwidth; for small value
    maps (H*W up to a few thousand) it is ~10x faster to build a sparse
    interpolation matrix as a dense one-hot (fused compare+multiply) and
    contract it with the value table on the MXU.

    Args:
      value: (B, H*W, C).
      loc: (B, S, 2) in [0, 1], grid_sample align_corners=False semantics.
      chunk: samples per scan step (bounds the one-hot buffer).

    Returns: (B, S, C), matching :func:`msda_sample` numerics (exactly for
      f32 values; bf16 values quantise the interpolation weights to bf16).
    """
    B, HW, C = value.shape
    H, W = spatial_shape
    S = loc.shape[1]
    pad = (-S) % chunk
    locp = jnp.pad(loc, ((0, 0), (0, pad), (0, 0)))
    n_chunks = (S + pad) // chunk
    corners = _bilinear_corners(locp, H, W)
    idxs = jnp.stack([c[0] for c in corners], 0).reshape(
        4, B, n_chunks, chunk).transpose(2, 1, 0, 3)
    wgts = jnp.stack([c[1] for c in corners], 0).reshape(
        4, B, n_chunks, chunk).transpose(2, 1, 0, 3)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, HW), 2)

    def step(_, sl):
        idx, w = sl  # (B, 4, chunk)
        oh = jnp.zeros((B, chunk, HW), value.dtype)
        for c in range(4):
            oh = oh + ((iota == idx[:, c][..., None])
                       * w[:, c][..., None]).astype(value.dtype)
        return _, jnp.einsum("bsv,bvc->bsc", oh, value)

    if remat:
        # drop the per-chunk one-hot from the scan residuals (at flagship
        # training shapes the stacked oh buffers are ~4 GB each) and
        # rebuild it in the backward pass instead
        step = jax.checkpoint(step)
    _, out = jax.lax.scan(step, 0, (idxs, wgts))
    out = out.transpose(1, 0, 2, 3).reshape(B, S + pad, C)
    return out[:, :S]


def bilinear_sample_matrix(loc: jnp.ndarray,
                           spatial_shape: Tuple[int, int],
                           dtype=jnp.float32) -> jnp.ndarray:
    """Dense (B, S, H*W) bilinear interpolation matrix for STATIC
    sampling locations, so ``sample = mat @ value`` is one MXU matmul.

    The serving-path hoist of :func:`bilinear_sample_onehot`: on a fixed
    rig the reference points are calibration constants
    (``fbocc_trt.py:42-76``), so the 4-tap interpolation matrix is a
    constant too -- precomputed once by ``spatial_ca_static_terms`` and
    fed to the jitted step as a device input instead of being rebuilt by
    the one-hot scan every frame (~2.9 ms/frame, docs/PERF.md round-4).
    Numerics match :func:`bilinear_sample_onehot` (same corner math).
    """
    H, W = spatial_shape
    HW = H * W
    corners = _bilinear_corners(loc, H, W)
    iota = jax.lax.broadcasted_iota(
        jnp.int32, loc.shape[:-1] + (HW,), loc.ndim - 1)
    mat = jnp.zeros(loc.shape[:-1] + (HW,), dtype)
    for idx, w in corners:
        mat = mat + ((iota == idx[..., None])
                     * w[..., None]).astype(dtype)
    return mat


def deformable_sample_attend(value: jnp.ndarray,
                             spatial_shape: Tuple[int, int],
                             loc: jnp.ndarray, attn: jnp.ndarray,
                             chunk_q: int = 128,
                             remat: bool = False) -> jnp.ndarray:
    """Fused deformable-attention sampling + weighting, one-hot matmul form.

    Samples the *full* channel vector per point on the MXU, weights by
    attention, then selects each head's channel slice with a static mask --
    avoiding both per-head small-row gathers and a (B, Q*P, C) intermediate.

    Args:
      value: (B, H*W, heads, head_dim).
      loc: (B, Q, heads, P, 2) in [0, 1].
      attn: (B, Q, heads, P) attention weights.

    Returns: (B, Q, heads*head_dim).
    """
    B, HW, heads, hd = value.shape
    H, W = spatial_shape
    Q, P = loc.shape[1], loc.shape[3]
    C = heads * hd
    v = value.reshape(B, HW, C)
    head_mask = jnp.zeros((heads, C), v.dtype)
    for h in range(heads):
        head_mask = head_mask.at[h, h * hd:(h + 1) * hd].set(1.0)

    pad = (-Q) % chunk_q
    locp = jnp.pad(loc, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
    attnp = jnp.pad(attn, ((0, 0), (0, pad), (0, 0), (0, 0)))
    n_chunks = (Q + pad) // chunk_q
    corners = _bilinear_corners(locp, H, W)
    # (n_chunks, B, 4, chunk_q*heads*P)
    idxs = jnp.stack([c[0] for c in corners], 0).reshape(
        4, B, n_chunks, chunk_q * heads * P).transpose(2, 1, 0, 3)
    wgts = jnp.stack([c[1] for c in corners], 0).reshape(
        4, B, n_chunks, chunk_q * heads * P).transpose(2, 1, 0, 3)
    attn_c = attnp.reshape(B, n_chunks, chunk_q, heads, P).transpose(
        1, 0, 2, 3, 4)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, HW), 2)

    def step(_, sl):
        idx, w, a = sl
        oh = jnp.zeros((B, chunk_q * heads * P, HW), v.dtype)
        for c in range(4):
            oh = oh + ((iota == idx[:, c][..., None])
                       * w[:, c][..., None]).astype(v.dtype)
        sampled = jnp.einsum("bsv,bvc->bsc", oh, v).reshape(
            B, chunk_q, heads, P, C)
        out = jnp.einsum("bqhpc,bqhp,hc->bqc",
                         sampled.astype(jnp.float32),
                         a.astype(jnp.float32),
                         head_mask.astype(jnp.float32))
        return _, out

    if remat:
        step = jax.checkpoint(step)  # see bilinear_sample_onehot
    _, out = jax.lax.scan(step, 0, (idxs, wgts, attn_c))
    out = out.transpose(1, 0, 2, 3).reshape(B, Q + pad, C)
    return out[:, :Q]


def msda_sample(value: jnp.ndarray, spatial_shape: Tuple[int, int],
                loc: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample a flattened single-level value map.

    Args:
      value: (B, H*W, heads, head_dim).
      spatial_shape: (H, W).
      loc: (B, Q, heads, P, 2) sampling locations in [0, 1] (x, y).

    Returns:
      (B, Q, heads, P, head_dim).
    """
    B, HW, heads, hd = value.shape
    H, W = spatial_shape
    Q, P = loc.shape[1], loc.shape[3]
    # one image per (batch, head)
    v = value.reshape(B, H, W, heads, hd)
    v = jnp.transpose(v, (0, 3, 1, 2, 4)).reshape(B * heads, H, W, hd)
    g = jnp.transpose(loc, (0, 2, 1, 3, 4)).reshape(B * heads, Q, P, 2)
    g = 2.0 * g - 1.0
    out = grid_sample_2d(v, g, align_corners=False)  # (B*heads, Q, P, hd)
    out = out.reshape(B, heads, Q, P, hd)
    return jnp.transpose(out, (0, 2, 1, 3, 4))


def deformable_sample_attend_grid_tiled(
        value: jnp.ndarray, spatial_shape: Tuple[int, int],
        loc: jnp.ndarray, attn: jnp.ndarray, tile: int = 4,
        slab: int = 32) -> jnp.ndarray:
    """Fused deformable attention where the queries ARE the value grid
    (BEV self-attention): query q = (qy*W + qx) attends near its own cell.

    Locality tiling (cf. grid_sample_3d_tiled): queries are processed in
    (tile x tile) blocks; each block's samples are interpolated from a
    ``slab x slab`` window via a small one-hot matmul instead of a one-hot
    over the full H*W table (100x smaller for the 100x100 BEV).

    Sampling offsets beyond the slab are clamped to its edge (their
    bilinear weight is kept) -- exact as long as |offset| stays within
    ~(slab - tile)/2 - 1 cells of the reference point, which holds by a
    wide margin for BEVFormer-style learned offsets (init <= 2 cells).

    Args:
      value: (B, H*W, heads, head_dim), H*W == Q.
      loc: (B, Q, heads, P, 2) in [0, 1].
      attn: (B, Q, heads, P).

    Returns: (B, Q, heads*head_dim) float32.
    """
    B, HW, heads, hd = value.shape
    H, W = spatial_shape
    Q, P = loc.shape[1], loc.shape[3]
    assert Q == HW and H % tile == 0 and W % tile == 0
    C = heads * hd
    K = heads * P
    Ht, Wt = H // tile, W // tile
    T = Ht * Wt
    n_out = tile * tile
    S = n_out * K  # samples per tile
    slab = min(slab, H, W)
    SL = slab * slab

    corners = _bilinear_corners(loc, H, W)  # idx into H*W, weights

    def to_tiles(a, trailing):
        a = a.reshape((B, Ht, tile, Wt, tile) + trailing)
        a = jnp.moveaxis(a, 3, 2)
        return a.reshape((B, T, n_out) + trailing)

    # slab origin per tile, from the tile's own grid position (static!)
    ty = jnp.arange(Ht) * tile
    tx = jnp.arange(Wt) * tile
    oy = jnp.clip(ty + tile // 2 - slab // 2, 0, max(H - slab, 0))
    ox = jnp.clip(tx + tile // 2 - slab // 2, 0, max(W - slab, 0))
    oy_t = jnp.repeat(oy, Wt)  # (T,)
    ox_t = jnp.tile(ox, Ht)

    # fetch slabs (static offsets per tile -> plain slicing via gather of
    # static windows; dynamic_slice keeps it simple and fuses well)
    v2 = value.reshape(B, H, W, C)

    def fetch_b(vol_b):
        def one(o):
            return jax.lax.dynamic_slice(
                vol_b, (o[0], o[1], 0), (slab, slab, C))
        return jax.vmap(one)(jnp.stack([oy_t, ox_t], -1))

    slabs = jax.vmap(fetch_b)(v2).reshape(B, T, SL, C)

    head_mask = jnp.zeros((K, C), jnp.float32)
    for h in range(heads):
        head_mask = head_mask.at[h * P:(h + 1) * P,
                                 h * hd:(h + 1) * hd].set(1.0)

    oh = jnp.zeros((B, T, S, SL), value.dtype)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, SL), 3)
    for idx, w in corners:
        gy = (idx // W).reshape(B, Q, K)
        gx = (idx % W).reshape(B, Q, K)
        gy_t = to_tiles(gy, (K,))
        gx_t = to_tiles(gx, (K,))
        w_t = to_tiles(w.reshape(B, Q, K) * attn.reshape(B, Q, K), (K,))
        ly = jnp.clip(gy_t - oy_t[None, :, None, None], 0, slab - 1)
        lx = jnp.clip(gx_t - ox_t[None, :, None, None], 0, slab - 1)
        lidx = (ly * slab + lx).reshape(B, T, S)
        oh = oh + ((iota == lidx[..., None])
                   * w_t.reshape(B, T, S)[..., None]).astype(value.dtype)
    sampled = jnp.einsum("btsv,btvc->btsc", oh, slabs).astype(jnp.float32)
    sampled = sampled.reshape(B, T, n_out, K, C)
    out = jnp.einsum("btqkc,kc->btqc", sampled, head_mask)
    # untile back to row-major queries
    out = out.reshape(B, Ht, Wt, tile, tile, C)
    out = jnp.moveaxis(out, 2, 3).reshape(B, Q, C)
    return out


def multi_scale_deformable_attention(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-level deformable attention aggregation.

    Args:
      value: (B, sum(H_l*W_l), heads, head_dim).
      spatial_shapes: list of (H_l, W_l) per level (static python ints).
      sampling_locations: (B, Q, heads, L, P, 2) in [0, 1].
      attention_weights: (B, Q, heads, L, P).

    Returns:
      (B, Q, heads * head_dim).
    """
    B, _, heads, hd = value.shape
    Q = sampling_locations.shape[1]
    out = jnp.zeros((B, Q, heads, hd), value.dtype)
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        v_l = value[:, start:start + H * W]
        start += H * W
        sampled = msda_sample(
            v_l, (H, W), sampling_locations[:, :, :, lvl]
        )  # (B, Q, heads, P, hd)
        out = out + jnp.einsum(
            "bqhpc,bqhp->bqhc", sampled, attention_weights[:, :, :, lvl]
        )
    return out.reshape(B, Q, heads * hd)
