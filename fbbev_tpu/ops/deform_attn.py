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

import jax.numpy as jnp

from fbbev_tpu.ops.grid_sample import grid_sample_2d


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
