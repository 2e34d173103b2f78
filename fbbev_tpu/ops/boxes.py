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


# ----------------------------------------------------------------------
# Rotated-box IoU + NMS (the mmcv ``nms_rotated`` / ``nms_gpu`` surface,
# ``/root/reference/mmdet3d/core/post_processing/box3d_nms.py:13-76``;
# used by the reference's LiDAR heads and available as the nuScenes
# ``nms_type='rotate'`` option).
#
# TPU formulation: the intersection of two convex quads is convex, so its
# vertices are a fixed-size candidate set (4 corners of A inside B, 4 of
# B inside A, 16 edge-pair crossings).  Candidates are angle-sorted
# around their centroid with invalid slots filled by the last valid
# vertex (duplicates contribute nothing to the shoelace sum) -- no
# dynamic compaction, fully vectorised over box pairs.


def _quad_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 5) [x, y, dx, dy, yaw] -> (N, 4, 2) corners (consistent ring)."""
    x, y, dx, dy, yaw = (boxes[:, i] for i in range(5))
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    local = jnp.stack([
        jnp.stack([dx / 2, dy / 2], -1),
        jnp.stack([-dx / 2, dy / 2], -1),
        jnp.stack([-dx / 2, -dy / 2], -1),
        jnp.stack([dx / 2, -dy / 2], -1),
    ], 1)
    rot = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)
    return jnp.einsum("nij,nkj->nki", rot, local) + \
        jnp.stack([x, y], -1)[:, None, :]


def _point_in_quad(pts, quad):
    """pts (..., P, 2) inside convex quad (..., 4, 2) (winding-agnostic)."""
    a = quad
    b = jnp.roll(quad, -1, axis=-2)
    edge = b - a  # (..., 4, 2)
    rel = pts[..., :, None, :] - a[..., None, :, :]  # (..., P, 4, 2)
    cross = edge[..., None, :, 0] * rel[..., 1] - \
        edge[..., None, :, 1] * rel[..., 0]  # (..., P, 4)
    eps = 1e-7
    return jnp.all(cross >= -eps, -1) | jnp.all(cross <= eps, -1)


def _seg_crossings(qa, qb):
    """All 16 edge-pair intersection points of two quads.

    qa/qb (..., 4, 2) -> pts (..., 16, 2), valid (..., 16)."""
    a0 = qa[..., :, None, :]            # (..., 4, 1, 2)
    a1 = jnp.roll(qa, -1, -2)[..., :, None, :]
    b0 = qb[..., None, :, :]            # (..., 1, 4, 2)
    b1 = jnp.roll(qb, -1, -2)[..., None, :, :]
    da, db = a1 - a0, b1 - b0
    denom = da[..., 0] * db[..., 1] - da[..., 1] * db[..., 0]
    rel = b0 - a0
    t = (rel[..., 0] * db[..., 1] - rel[..., 1] * db[..., 0]) / \
        jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom)
    u = (rel[..., 0] * da[..., 1] - rel[..., 1] * da[..., 0]) / \
        jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom)
    valid = (jnp.abs(denom) >= 1e-9) & (t >= 0) & (t <= 1) & \
        (u >= 0) & (u <= 1)
    pts = a0 + t[..., None] * da
    shape = pts.shape[:-3] + (16, 2)
    return pts.reshape(shape), valid.reshape(shape[:-1])


def _convex_area_from_candidates(pts, valid):
    """Area of the convex hull of ``pts`` rows flagged ``valid``
    (pts are known to be exactly the polygon's vertices).

    pts (..., M, 2), valid (..., M) -> (...)."""
    M = pts.shape[-2]
    nv = jnp.maximum(jnp.sum(valid, -1), 1)
    cen = jnp.sum(jnp.where(valid[..., None], pts, 0.0), -2) / nv[..., None]
    ang = jnp.arctan2(pts[..., 1] - cen[..., None, 1],
                      pts[..., 0] - cen[..., None, 0])
    key = jnp.where(valid, ang, jnp.inf)
    order = jnp.argsort(key, -1)
    p_s = jnp.take_along_axis(pts, order[..., None], -2)
    v_s = jnp.take_along_axis(valid, order, -1)
    # fill invalid tail slots with the last valid vertex (duplicates add 0)
    idx = jnp.where(v_s, jnp.arange(M), -1)
    idx = jax.lax.cummax(idx, axis=idx.ndim - 1)
    idx = jnp.maximum(idx, 0)
    ring = jnp.take_along_axis(p_s, idx[..., None], -2)
    nxt = jnp.roll(ring, -1, -2)
    cross = ring[..., 0] * nxt[..., 1] - ring[..., 1] * nxt[..., 0]
    area = 0.5 * jnp.abs(jnp.sum(cross, -1))
    return jnp.where(jnp.sum(valid, -1) >= 3, area, 0.0)


def rotated_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise BEV IoU of rotated boxes (N, 5) x (M, 5) -> (N, M)."""
    qa = _quad_corners(boxes_a)[:, None]   # (N, 1, 4, 2)
    qb = _quad_corners(boxes_b)[None]      # (1, M, 4, 2)
    N, M = boxes_a.shape[0], boxes_b.shape[0]
    qa = jnp.broadcast_to(qa, (N, M, 4, 2))
    qb = jnp.broadcast_to(qb, (N, M, 4, 2))
    in_ab = _point_in_quad(qa, qb)         # (N, M, 4)
    in_ba = _point_in_quad(qb, qa)
    xing, xval = _seg_crossings(qa, qb)    # (N, M, 16, 2/16)
    pts = jnp.concatenate([qa, qb, xing], -2)          # (N, M, 24, 2)
    val = jnp.concatenate([in_ab, in_ba, xval], -1)    # (N, M, 24)
    inter = _convex_area_from_candidates(pts, val)
    area_a = (boxes_a[:, 2] * boxes_a[:, 3])[:, None]
    area_b = (boxes_b[:, 2] * boxes_b[:, 3])[None, :]
    union = jnp.maximum(area_a + area_b - inter, 1e-7)
    return inter / union


def nms_rotated(boxes: jnp.ndarray, scores: jnp.ndarray,
                iou_threshold: float) -> jnp.ndarray:
    """Greedy rotated-box NMS.

    Args:
      boxes: (K, 5) [x, y, dx, dy, yaw], sorted by descending score.
      scores: (K,) descending scores (score <= -inf marks invalid rows).
      iou_threshold: suppress candidates with IoU > threshold.

    Returns: keep (K,) bool mask (static shape; combine with the score
    mask for the reference's index-list semantics)."""
    K = boxes.shape[0]
    iou = rotated_iou(boxes, boxes)
    overlap = iou > iou_threshold

    def body(j, keep):
        suppress = overlap[j, :] & keep[j]
        keep = keep & (~suppress | (jnp.arange(K) <= j))
        return keep

    keep = jnp.ones((K,), bool) & jnp.isfinite(scores)
    return jax.lax.fori_loop(0, K, body, keep)
