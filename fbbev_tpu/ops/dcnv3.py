"""DCNv3 core op (InternImage deformable convolution v3).

Functional spec: the reference ships the CUDA kernels plus a pure-PyTorch
reference implementation (``/root/reference/mmdet3d/ops/ops_dcnv3/functions/
dcnv3_func.py`` -- ``dcnv3_core_pytorch``): grouped K-point deformable
sampling with per-point softmax masks; sampling locations are output-pixel
centres plus the dilated kernel grid plus learned offsets (normalised by
the spatial size), bilinearly sampled with align_corners=False and zero
padding.

This XLA composition covers the stride-1, SAME-padding configuration used
by the InternImage backbone family.  Used only by large-backbone variants;
hot-path sampling machinery lives in ``deform_attn.py``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from fbbev_tpu.ops.grid_sample import grid_sample_2d


def dcnv3_core(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
               kernel: Tuple[int, int] = (3, 3), dilation: int = 1,
               groups: int = 4, offset_scale: float = 1.0) -> jnp.ndarray:
    """Args:
      x: (B, H, W, C) value features (already input-projected).
      offset: (B, H, W, G*K*2) pixel-unit offsets (x, y interleaved last).
      mask: (B, H, W, G*K) *already softmaxed over K* per group.
      kernel: (kh, kw); dilation: int; groups: channel groups G.

    Returns: (B, H, W, C).
    """
    B, H, W, C = x.shape
    kh, kw = kernel
    K = kh * kw
    G = groups
    Cg = C // G

    # dilated kernel grid around the centre, pixel units
    dys = (jnp.arange(kh, dtype=jnp.float32) - (kh - 1) / 2) * dilation
    dxs = (jnp.arange(kw, dtype=jnp.float32) - (kw - 1) / 2) * dilation
    gy, gx = jnp.meshgrid(dys, dxs, indexing="ij")
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (K, 2)

    # output-pixel centres, pixel units
    cy = jnp.arange(H, dtype=jnp.float32) + 0.5
    cx = jnp.arange(W, dtype=jnp.float32) + 0.5
    ctr = jnp.stack(jnp.meshgrid(cx, cy, indexing="xy"), -1)  # (H, W, 2)

    off = offset.reshape(B, H, W, G, K, 2) * offset_scale
    loc = (ctr[None, :, :, None, None, :] + grid[None, None, None, None]
           + off)  # (B, H, W, G, K, 2) pixel units
    loc = loc / jnp.asarray([W, H], jnp.float32)  # [0, 1]

    # sample per group: value (B*G, H, W, Cg), grid (B*G, H*W, K, 2)
    v = x.reshape(B, H, W, G, Cg)
    v = jnp.transpose(v, (0, 3, 1, 2, 4)).reshape(B * G, H, W, Cg)
    g2 = jnp.transpose(loc, (0, 3, 1, 2, 4, 5)).reshape(
        B * G, H * W, K, 2) * 2.0 - 1.0
    sampled = grid_sample_2d(v, g2, align_corners=False)  # (B*G, HW, K, Cg)

    m = jnp.transpose(mask.reshape(B, H, W, G, K),
                      (0, 3, 1, 2, 4)).reshape(B * G, H * W, K)
    out = jnp.einsum("nqkc,nqk->nqc", sampled, m)
    out = out.reshape(B, G, H, W, Cg)
    return jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(B, H, W, C)
