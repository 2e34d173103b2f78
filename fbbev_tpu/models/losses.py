"""Occupancy losses: focal CE, sem/geo scal, lovasz softmax, depth BCE.

Parity references (``/root/reference/mmdet3d/models/fbbev/modules/occ_loss_utils/``):

* focal: ``focal_loss.py:165-310`` (CustomFocalLoss: sigmoid focal over
  one-hot labels, per-class 1/log(freq) weights x per-voxel BEV distance
  weight in [1, 2], loss_weight 100, sum over classes then mean over
  visible voxels)
* sem/geo scal: ``semkitti.py:78-163`` (-log precision/recall/specificity;
  sem over classes 1..17, geo vs the free class)
* lovasz: ``lovasz_softmax.py:157-207`` (classes='present', ignore 255)
* class frequencies: ``nusc_param.py:14-33``

All losses run in float32 on static shapes: boolean-indexed selections in
the reference become masked reductions here.  Labels use the fix_void
convention: 0 = void (weight 0), 1..17 = semantics, 18 = free, 255 = ignore.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Occ3D-nuScenes voxel counts (nusc_param.py:14-33), 18 entries
# (classes 0..16 + free).
NUSC_CLASS_FREQUENCIES = np.array([
    944004, 1897170, 152386, 2391677, 16957802, 724139, 189027, 2074468,
    413451, 2384460, 5916653, 175883646, 4275424, 51393615, 61411620,
    105975596, 116424404, 1892500630,
], np.float64)

NUSC_CLASS_NAMES = [
    "others", "barrier", "bicycle", "bus", "car", "construction_vehicle",
    "motorcycle", "pedestrian", "traffic_cone", "trailer", "truck",
    "driveable_surface", "other_flat", "sidewalk", "terrain", "manmade",
    "vegetation", "free",
]


def occ_class_weights(num_classes: int = 19) -> np.ndarray:
    """1/log(freq) class weights; with 19 outputs class 0 (void) gets 0
    (``occupancy_head.py:117-125``)."""
    w = 1.0 / np.log(NUSC_CLASS_FREQUENCIES[: num_classes] + 0.001)
    if num_classes == 19:
        w = np.concatenate([[0.0], 1.0 / np.log(
            NUSC_CLASS_FREQUENCIES[:18] + 0.001)])
    return w.astype(np.float32)


def bev_distance_weight(h: int = 200, w: int = 200) -> np.ndarray:
    """Radial BEV weight in [1, 2] (``focal_loss.py:198-203``)."""
    yy, xx = np.meshgrid(np.arange(h) - h / 2, np.arange(w) - w / 2,
                         indexing="ij")
    c = np.sqrt(xx**2 + yy**2)
    return (c / c.max() + 1.0).astype(np.float32)


def focal_ce_loss(logits: jnp.ndarray, target: jnp.ndarray,
                  class_weights: jnp.ndarray,
                  dist_weight: Optional[jnp.ndarray] = None,
                  gamma: float = 2.0, alpha: float = 0.25,
                  loss_weight: float = 100.0,
                  ignore_index: int = 255) -> jnp.ndarray:
    """Sigmoid focal loss over one-hot voxel labels.

    Args:
      logits: (B, H, W, D, C).
      target: (B, H, W, D) int labels.
      class_weights: (C,).
      dist_weight: (H, W) radial weight, broadcast over B and D.
    """
    B, H, W, D, C = logits.shape
    logits = logits.astype(jnp.float32)
    valid = (target != ignore_index)
    t = jnp.where(valid, target, 0)
    onehot = jax.nn.one_hot(t, C, dtype=jnp.float32)

    p = jax.nn.sigmoid(logits)
    pt = (1.0 - p) * onehot + p * (1.0 - onehot)
    focal_w = (alpha * onehot + (1 - alpha) * (1 - onehot)) * pt ** gamma
    bce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    loss = bce * focal_w  # (B,H,W,D,C)

    if dist_weight is None:
        dist_weight = jnp.ones((H, W), jnp.float32)
    wmask = class_weights[None, None, None, None, :] * \
        dist_weight[None, :, :, None, None]
    loss = jnp.sum(loss * wmask, axis=-1)  # sum over classes
    loss = jnp.sum(loss * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return loss_weight * loss


def _neg_log(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    return -jnp.log(jnp.clip(x, eps, 1.0 - eps))


def geo_scal_loss(logits: jnp.ndarray, target: jnp.ndarray,
                  ignore_index: int = 255,
                  non_empty_idx: int = 18) -> jnp.ndarray:
    """Occupied/free precision-recall-specificity loss (semkitti.py:78-105)."""
    pred = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    empty_probs = pred[..., non_empty_idx]
    nonempty_probs = 1.0 - empty_probs
    valid = (target != ignore_index)
    nonempty_target = ((target != non_empty_idx) & valid).astype(jnp.float32)
    nonempty_probs = nonempty_probs * valid
    empty_probs = empty_probs * valid
    eps = 1e-5
    inter = jnp.sum(nonempty_target * nonempty_probs)
    precision = inter / (jnp.sum(nonempty_probs) + eps)
    recall = inter / (jnp.sum(nonempty_target) + eps)
    empty_target = (valid & (target == non_empty_idx)).astype(jnp.float32)
    spec = jnp.sum(empty_target * empty_probs) / (jnp.sum(empty_target) + eps)
    return _neg_log(precision) + _neg_log(recall) + _neg_log(spec)


def sem_scal_loss(logits: jnp.ndarray, target: jnp.ndarray,
                  ignore_index: int = 255) -> jnp.ndarray:
    """Per-class precision/recall/specificity loss over classes 1..C-2
    (semkitti.py:108-163; with 19 classes the loop covers 1..17)."""
    C = logits.shape[-1]
    pred = jax.nn.softmax(
        logits.astype(jnp.float32), axis=-1).reshape(-1, C)
    labels = target.reshape(-1)
    valid = labels != ignore_index
    validf = valid.astype(jnp.float32)[:, None]
    # all classes batched through one set of (N, C) reductions (the
    # per-class python loop multiplied the emitted TPU code by ~17,
    # docs/ROUND2.md code-size bisect)
    P = pred * validf
    T = jax.nn.one_hot(labels, C, dtype=jnp.float32) * validf
    nom = jnp.sum(P * T, axis=0)
    sum_p = jnp.sum(P, axis=0)
    sum_t = jnp.sum(T, axis=0)
    not_t = validf - T
    sum_not_t = jnp.sum(not_t, axis=0)
    spec_num = jnp.sum((validf - P) * not_t, axis=0)
    precision = nom / (sum_p + 1e-5)
    recall = nom / (sum_t + 1e-5)
    specificity = spec_num / (sum_not_t + 1e-5)
    loss_c = (jnp.where(sum_p > 0, _neg_log(precision), 0.0)
              + _neg_log(recall)
              + jnp.where(sum_not_t > 0, _neg_log(specificity), 0.0))
    begin = 1 if C == 19 else 0
    in_range = (jnp.arange(C) >= begin) & (jnp.arange(C) < C - 1)
    present = (sum_t > 0) & in_range
    total = jnp.sum(jnp.where(present, loss_c, 0.0))
    count = jnp.sum(present.astype(jnp.float32))
    return total / jnp.maximum(count, 1.0)


def lovasz_softmax_loss(logits: jnp.ndarray, target: jnp.ndarray,
                        ignore_index: int = 255,
                        method: Optional[str] = None) -> jnp.ndarray:
    """Multi-class Lovasz-softmax with classes='present'
    (lovasz_softmax.py:157-207), expressed with masked sorts for static
    shapes: ignored voxels get error 0 / fg 0, which contributes nothing
    to the Lovasz dot product.

    ``method`` (default env ``FBBEV_LOVASZ`` or "hist"):

    * "sort": exact, one batched (C, N) ``lax.sort`` -- the TPU sort is
      the single largest op in the training step (~80 ms at 200x200x16,
      docs/PERF.md);
    * "hist" (DEFAULT since round 5 -- on-chip A/B: flagship train step
      385.5 -> 281.4 ms, /tmp/ab_r5c_train.jsonl): counting-sort
      formulation -- errors are quantized to ``FBBEV_LOVASZ_BINS``
      (default 2048) levels and the per-class histogram is built by
      one-hot matmuls (MXU work instead of sort throughput).  The Lovasz
      gradient-coefficient sum telescopes within an error-equal bin, so
      the loss equals the exact Lovasz of the quantized errors with the
      bin-mean error as representative: |hist - sort| <= bin_width.  The
      VJP is the bin-averaged Lovasz coefficient -- a smoothed version
      of the exact per-element one.
    """
    import os
    method = method or os.environ.get("FBBEV_LOVASZ", "hist")
    C = logits.shape[-1]
    probas = jax.nn.softmax(
        logits.astype(jnp.float32), axis=-1).reshape(-1, C)
    labels = target.reshape(-1)
    valid = labels != ignore_index
    if method == "hist":
        return _lovasz_hist(probas, labels, valid, C)

    # all classes through ONE batched multi-operand sort: the earlier
    # per-class python loop lowered 19 separate 640k-element sorts, which
    # alone emitted ~300 MB of TPU code in the training graph
    # (docs/ROUND2.md); lax.sort with co-sorted values also removes the
    # argsort + take_along_axis gather pair.
    fg = (jax.nn.one_hot(labels, C, dtype=jnp.float32)
          * valid[:, None].astype(jnp.float32))        # (N, C)
    errors = jnp.where(valid[:, None], jnp.abs(fg - probas), 0.0)
    neg_err_t = -errors.T                               # (C, N)
    # sort moves 5 bytes/element (f32 key + i8 payload): errors_sorted is
    # recovered by negating the sorted key, and the {0,1} fg payload rides
    # as int8 -- exact, ~2.4x less sort traffic than the naive
    # (key, errors, fg) f32 triple
    neg_sorted, fg_i8 = jax.lax.sort(
        (neg_err_t, fg.T.astype(jnp.int8)), dimension=1, num_keys=1)
    errors_sorted = -neg_sorted
    fg_sorted = fg_i8.astype(jnp.float32)
    gts = jnp.sum(fg_sorted, axis=1, keepdims=True)     # (C, 1)
    inter = gts - jnp.cumsum(fg_sorted, axis=1)
    union = gts + jnp.cumsum(1.0 - fg_sorted, axis=1)
    jaccard = 1.0 - inter / union
    grad = jnp.concatenate(
        [jaccard[:, :1], jaccard[:, 1:] - jaccard[:, :-1]], axis=1)
    loss_c = jnp.sum(jnp.maximum(errors_sorted, 0.0) * grad, axis=1)
    present = gts[:, 0] > 0
    total = jnp.sum(jnp.where(present, loss_c, 0.0))
    count = jnp.sum(present.astype(jnp.float32))
    return total / jnp.maximum(count, 1.0)


def _lovasz_hist(probas: jnp.ndarray, labels: jnp.ndarray,
                 valid: jnp.ndarray, C: int,
                 nbins: Optional[int] = None) -> jnp.ndarray:
    """Counting-sort Lovasz (see :func:`lovasz_softmax_loss`).

    Math: with errors quantized to bins, the per-element Lovasz
    coefficients ``grad[i] = J[i] - J[i-1]`` telescope over the (error-
    equal) run of each bin, so the loss needs the Jaccard index only at
    bin boundaries -- and those depend only on cumulative (count, fg)
    per bin, not on any within-bin order:

        loss_c = sum_b (J(b) - J(b-1)) * mean_error(b)

    where J(b) = 1 - inter/union after all elements with bin >= b.
    Histogram counts / fg sums / error sums are one-hot matmuls (the MXU
    formulation used throughout this framework, ops/deform_attn.py).
    """
    import os
    if nbins is None:
        nbins = int(os.environ.get("FBBEV_LOVASZ_BINS", "2048"))
    fg = (jax.nn.one_hot(labels, C, dtype=jnp.float32)
          * valid[:, None].astype(jnp.float32))        # (N, C)
    errors = jnp.where(valid[:, None], jnp.abs(fg - probas), 0.0)
    e_t = errors.T                                      # (C, N)
    fg_t = fg.T
    # bin 0 = error 0, bin nbins-1 = error 1; round-to-nearest level
    idx = jnp.round(e_t * (nbins - 1)).astype(jnp.int32)
    onehot = (idx[:, :, None] ==
              jnp.arange(nbins, dtype=jnp.int32)).astype(jnp.float32)
    ones = jnp.ones_like(e_t)
    # (C, N) x (C, N, B) -> (C, B); XLA fuses the one-hot build into the
    # contraction (no (C, N, B) materialisation -- verified by
    # memory_analysis, docs/ROUND4.md)
    cnt = jnp.einsum("cn,cnb->cb", ones, onehot)
    fgs = jnp.einsum("cn,cnb->cb", fg_t, onehot)
    es = jnp.einsum("cn,cnb->cb", e_t, onehot)

    # descending error order: flip so index 0 = largest error
    cnt_d = jnp.flip(cnt, axis=1)
    fgs_d = jnp.flip(fgs, axis=1)
    es_d = jnp.flip(es, axis=1)
    gts = jnp.sum(fg_t, axis=1, keepdims=True)          # (C, 1)
    cum_cnt = jnp.cumsum(cnt_d, axis=1)
    cum_fg = jnp.cumsum(fgs_d, axis=1)
    inter = gts - cum_fg
    union = gts + (cum_cnt - cum_fg)
    jacc = 1.0 - inter / jnp.maximum(union, 1e-9)       # J at bin ends
    jacc_prev = jnp.concatenate(
        [jnp.zeros_like(jacc[:, :1]), jacc[:, :-1]], axis=1)
    mean_e = es_d / jnp.maximum(cnt_d, 1.0)
    loss_c = jnp.sum((jacc - jacc_prev) * mean_e, axis=1)
    present = gts[:, 0] > 0
    total = jnp.sum(jnp.where(present, loss_c, 0.0))
    count = jnp.sum(present.astype(jnp.float32))
    return total / jnp.maximum(count, 1.0)


def ce_ssc_loss(logits: jnp.ndarray, target: jnp.ndarray,
                class_weights: jnp.ndarray,
                ignore_index: int = 255) -> jnp.ndarray:
    """Weighted cross entropy with ignore label (semkitti.py:166-180);
    mean weighted by per-sample class weight (torch CrossEntropyLoss
    'mean' semantics: sum(w_i * nll_i) / sum(w_i))."""
    C = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    valid = target != ignore_index
    t = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    w = class_weights[t] * valid
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-6)
