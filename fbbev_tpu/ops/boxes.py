"""3D box utilities: static-shape top-k decode helpers and circle NMS.

The reference uses mmcv CUDA rotated-box NMS for the CenterPoint head
(``/root/reference/mmdet3d/core/post_processing/box3d_nms.py``; its
``circle_nms`` numba variant is the CenterPoint-default for nuScenes).
On TPU we implement circle NMS as a static O(K^2) suppression scan --
K is the fixed top-k candidate count, so the whole decode stays jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def circle_nms(centers: jnp.ndarray, scores: jnp.ndarray,
               radius: jnp.ndarray | float,
               max_keep: int | None = None) -> jnp.ndarray:
    """Greedy distance-based suppression.

    Args:
      centers: (K, 2) box centres, sorted by descending score.
      scores: (K,) descending scores (only used for validity: score > -inf).
      radius: scalar or (K,) suppression radius per candidate.

    Returns:
      keep: (K,) bool mask.
    """
    K = centers.shape[0]
    d2 = jnp.sum(
        (centers[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (K,))
    thresh = r[None, :] ** 2  # suppression radius of the suppressor
    close = d2 < thresh  # close[i, j]: candidate i is within j's radius

    def body(j, keep):
        suppress = close[:, j] & keep[j]
        keep = keep & (~suppress | (jnp.arange(K) <= j))
        return keep

    keep = jnp.ones((K,), bool)
    keep = jax.lax.fori_loop(0, K, body, keep)
    return keep


def top_k_2d(scores: jnp.ndarray, k: int):
    """(C, H, W) score map -> (k,) scores, class ids, y, x."""
    C, H, W = scores.shape
    flat = scores.reshape(-1)
    vals, idx = jax.lax.top_k(flat, k)
    cls = idx // (H * W)
    rem = idx % (H * W)
    ys = rem // W
    xs = rem % W
    return vals, cls, ys, xs


def boxes_bev_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, >=7) [x, y, z, dx, dy, dz, yaw, ...] -> (N, 4, 2) BEV corners."""
    x, y = boxes[:, 0], boxes[:, 1]
    dx, dy = boxes[:, 3], boxes[:, 4]
    yaw = boxes[:, 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    local = jnp.stack([
        jnp.stack([dx / 2, dy / 2], -1),
        jnp.stack([dx / 2, -dy / 2], -1),
        jnp.stack([-dx / 2, -dy / 2], -1),
        jnp.stack([-dx / 2, dy / 2], -1),
    ], 1)  # (N, 4, 2)
    rot = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)
    return jnp.einsum("nij,nkj->nki", rot, local) + \
        jnp.stack([x, y], -1)[:, None, :]
