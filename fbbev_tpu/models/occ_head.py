"""Occupancy prediction head.

Parity reference: ``OccHead``
(``/root/reference/mmdet3d/models/fbbev/heads/occupancy_head.py:23-266``),
FB-OCC config (``fbocc-r50...py:231-249``): 3 input levels (256ch),
deconv3d deblock on level 0 (2x upsample), per-level 3x3x3 convs to 128ch,
softmax-weighted multi-scale fusion at 200x200x16, 1x1x1 prediction convs
to 19 classes; losses: focal CE (1/log-freq class weights + radial BEV
weight), sem_scal, geo_scal, lovasz.

The multi-scale GT mode-pooling branch (``occupancy_head.py:217-228``) is
implemented by :func:`downsample_gt_mode_pool` and engages automatically
whenever the supervised logits are coarser than the GT (a no-op for the
shipped full-resolution config).

Layout: voxel features (B, Y, X, Z, C); logits (B, Y, X, Z, num_classes).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from fbbev_tpu.models import losses as L
from fbbev_tpu.models.layers import (
    Conv1x1x1Dense, ConvBN, Deconv2x2x2, resize_trilinear)
from fbbev_tpu.registry import HEADS


@HEADS.register
class OccHead(nn.Module):
    in_channels: Sequence[int] = (256, 256, 256)
    out_channel: int = 19
    num_level: int = 3
    soft_weights: bool = True
    use_deblock: bool = True
    final_occ_size: Sequence[int] = (200, 200, 16)
    empty_idx: int = 18
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxel_feats, train: bool = False,
                 return_labels: bool = False):
        """Returns (B, Y, X, Z, out_channel) f32 logits, or -- with
        ``return_labels`` (the serving path, which only consumes the
        deployment argmax, ``fbocc_trt.py:85-127``) -- (B, Y, X, Z) int32
        labels, enabling the fused Pallas tail (ops/pallas_occ_tail.py,
        FBBEV_OCC_TAIL=1)."""
        assert len(voxel_feats) == self.num_level
        mid = self.in_channels[0] // 2
        outputs = []
        if self.use_deblock:
            from fbbev_tpu.models.layers import _DISABLED_DECOMP
            if "deconv" in _DISABLED_DECOMP:
                x0 = nn.ConvTranspose(
                    mid, (2, 2, 2), strides=(2, 2, 2), use_bias=False,
                    dtype=self.dtype, name="deblock_conv")(voxel_feats[0])
            else:
                x0 = Deconv2x2x2(mid, use_bias=False, dtype=self.dtype,
                                 name="deblock_conv")(voxel_feats[0])
            x0 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=self.dtype,
                              name="deblock_bn")(x0)
            outputs.append(nn.relu(x0))
        # FBBEV_OCCHEAD_CONV3D: per-head 3x3x3 impl ("zslab" / "zfold" /
        # "native").  Eval default ZSLAB since the round-5 queue-G
        # on-chip A/B at the shipped stack (image-trunk-only int8 +
        # fuse-warp epilogue): 31.98 vs 30.05 fps for the zfold head
        # (/tmp/ab_r5g.jsonl) — reversing the round-4 bf16-era call
        # (26.68 -> 28.04 toward zfold under a different default stack).
        # Stride-1 z-slab is NOT in the v5e stride-2 miscompile family
        # (docs/ROUND5.md sessions 1-2), and these head convs are all
        # stride 1.  Param layouts are nn.Conv-compatible for all three,
        # so checkpoints are unaffected by the routing.
        import os
        # the eval routing is a SERVING measurement; train keeps the
        # global default (FBBEV_CONV3D env) unless explicitly overridden
        # (ADVICE r4).
        occ_impl = (os.environ.get("FBBEV_OCCHEAD_CONV3D")
                    or (None if train else "zslab"))
        for i in range(self.num_level):
            outputs.append(
                ConvBN(mid, 3, padding=1, ndim=3, dtype=self.dtype,
                       impl3d=occ_impl,
                       name=f"occ_conv{i}")(voxel_feats[i], train))

        n_feats = len(outputs)
        if self.soft_weights:
            w = ConvBN(mid // 2, 1, padding=0, ndim=3, dtype=self.dtype,
                       name="soft_weight_conv1")(outputs[0], train)
            from fbbev_tpu.models.layers import (
                _DISABLED_DECOMP as _DD, _POINTWISE_EVAL_ONLY as _PEO)
            if "pointwise" in _DD or (train and _PEO):
                w = nn.Conv(n_feats, (1, 1, 1), use_bias=False,
                            dtype=self.dtype, name="soft_weight_conv2")(w)
            else:
                w = Conv1x1x1Dense(n_feats, use_bias=False, dtype=self.dtype,
                                   name="soft_weight_conv2")(w)
            w = jax.nn.softmax(w, axis=-1)  # (B, Y, X, Z, n_feats)
        else:
            w = jnp.full(outputs[0].shape[:4] + (n_feats,), 1.0 / n_feats)

        target_size = outputs[0].shape[1:4]
        import os
        coarse_pred = (not train and os.environ.get(
            "FBBEV_OCC_COARSE_PRED", "1") == "1")
        if return_labels and coarse_pred and self._tail_ok(
                outputs, target_size):
            # fused Pallas tail (upsample + blend + BN + relu + class
            # matmul per VMEM row-band, ops/pallas_occ_tail.py): the
            # full-res blended volume and its relu image never reach HBM.
            # Stays OPT-IN: the on-chip A/B regressed (28.46 vs 31.37
            # fps, /tmp/ab_r5f.jsonl) -- the row-band grid serializes
            # work XLA overlaps across the blend/upsample fusion
            # (docs/PERF.md round-5 queue F).
            mid2 = mid // 2
            conv2 = Conv1x1x1Dense(self.out_channel, use_bias=False,
                                   dtype=self.dtype, name="pred_conv2")
            conv2(jnp.zeros((1, 1, 1, 1, mid2), self.dtype))  # bind
            k2 = conv2.variables["params"]["kernel"].reshape(
                mid2, self.out_channel)
            logits = _PredConvFused(mid2, dtype=self.dtype,
                                    name="pred_conv1")(
                outputs, w, target_size, train, tail_k2=k2)
            return logits.astype(jnp.float32).argmax(-1).astype(jnp.int32)
        if coarse_pred:
            # algebraic restructure (eval): pred_conv1 is a 1x1x1 channel
            # mix, the blend weight is a per-voxel scalar, and the
            # upsample is spatially linear, so
            #   conv1(sum_i up_i(f_i) * w_i) == sum_i up_i(conv1(f_i)) * w_i
            # -- applying the conv per level at COARSE resolution halves
            # the channels (128 -> 64) flowing through the full-res
            # upsample + blend, the occ head's dominant HBM cost
            # (docs/PERF.md round-4).  BN runs after the sum either way,
            # so numerics match the reference order exactly.
            y = _PredConvFused(mid // 2, dtype=self.dtype,
                               name="pred_conv1")(
                outputs, w, target_size, train)
        else:
            fused = self._fuse_levels(outputs, w, target_size, train)
            y = ConvBN(mid // 2, 1, padding=0, ndim=3, dtype=self.dtype,
                       name="pred_conv1")(fused, train)
        from fbbev_tpu.models.layers import (
            _DISABLED_DECOMP as _DD2, _POINTWISE_EVAL_ONLY as _PEO2)
        if "pointwise" in _DD2 or (train and _PEO2):
            logits = nn.Conv(self.out_channel, (1, 1, 1), use_bias=False,
                             dtype=self.dtype, name="pred_conv2")(y)
        else:
            logits = Conv1x1x1Dense(self.out_channel, use_bias=False,
                                    dtype=self.dtype, name="pred_conv2")(y)
        logits = logits.astype(jnp.float32)
        if return_labels:
            return logits.argmax(-1).astype(jnp.int32)
        return logits

    @staticmethod
    def _tail_ok(outputs, target_size):
        """The fused tail engages only for integer-factor level shapes on
        TPU (or under the interpret-mode test hook)."""
        import os
        if os.environ.get("FBBEV_OCC_TAIL", "0") != "1":
            return False
        if (jax.default_backend() != "tpu"
                and os.environ.get("FBBEV_FORCE_OCC_TAIL") != "interpret"):
            return False
        Y, X, Z = target_size
        return all(s[1] and Y % s[1] == 0 and s[2] and X % s[2] == 0
                   and s[3] and Z % s[3] == 0
                   for s in (f.shape for f in outputs))

    @staticmethod
    def _fuse_levels(outputs, w, target_size, train):
        """Upsample every level to ``target_size`` and blend with ``w``.

        Eval on TPU can use the fused Pallas kernel (upsample + blend in
        VMEM, no full-res per-level HBM round-trips; identical numerics,
        tests/test_pallas_occ_fuse.py).  OPT-IN via FBBEV_OCCFUSE=1: the
        kernel passes standalone and in a full OccHead jit at flagship
        shapes, but inside the complete FBOCC eval graph it crashes the
        v5e worker at execution (docs/PERF.md round 2) -- same
        full-graph-only failure mode as the pointwise-in-train issue.
        """
        import os
        Y, X, Z = target_size
        fuseable = (not train
                    and os.environ.get("FBBEV_OCCFUSE", "0") == "1"
                    # test hook: force the kernel through the Pallas
                    # interpreter on any platform (full-model equivalence)
                    and (jax.default_backend() == "tpu"
                         or os.environ.get("FBBEV_FORCE_OCCFUSE")
                         == "interpret")
                    # Mosaic rejects the kernel's lerp-phase reshape when
                    # the channel dim is not lane-full (C=64 via the
                    # coarse-pred path: "unsupported shape cast",
                    # docs/ROUND4.md) -- and the kernel measured SLOWER
                    # in-graph anyway; kept as an opt-in experiment only
                    and outputs[0].shape[-1] % 128 == 0
                    and all(s[1] and Y % s[1] == 0 and s[2]
                            and X % s[2] == 0 and s[3] and Z % s[3] == 0
                            for s in (f.shape for f in outputs)))
        if fuseable:
            from fbbev_tpu.models.layers import _upsample_int_axis
            from fbbev_tpu.ops.pallas_occ_fuse import fuse_multiscale
            levels_y = [f if f.shape[1] == Y
                        else _upsample_int_axis(f, 1, Y // f.shape[1])
                        for f in outputs]
            return fuse_multiscale(levels_y, w.astype(outputs[0].dtype))
        up = [f if f.shape[1:4] == target_size else
              resize_trilinear(f, target_size, align_corners=False)
              for f in outputs]
        # single fused expression: one pass over the full-res volumes
        # instead of n_feats accumulate round-trips (docs/PERF.md r2 trace)
        return sum(f * w[..., i:i + 1] for i, f in enumerate(up))


class _PredConvFused(nn.Module):
    """``ConvBN(features, 1, ndim=3)`` (child names conv/bn, so the param
    tree and checkpoints are identical to the ConvBN it replaces) with the
    conv pushed through the multi-scale blend: one shared 1x1x1 conv
    applied per level at its native resolution, then upsample + blend at
    the reduced channel count, then BN + relu.  Exact: the conv is linear
    in its input and commutes with the per-voxel scalar weights and the
    linear upsample; the (identity-folded or live-stat) BN sees the same
    tensor either way."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, outputs, w, target_size, train: bool,
                 tail_k2=None):
        conv = Conv1x1x1Dense(self.features, use_bias=False,
                              dtype=self.dtype, name="conv")
        ys = [conv(f) for f in outputs]  # shared params across levels
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype, name="bn")
        if tail_k2 is not None:
            # fused Pallas tail: upsample Z (at coarse X) and Y (leading
            # dim) here; the X interleave + blend + BN affine + relu +
            # class matmul run per VMEM row-band in the kernel.  The
            # dummy call binds/creates the BN params so the eval affine
            # is readable (during init too) -- same pattern as the
            # fuse-warp epilogue (fbocc.py).
            bn(jnp.zeros((1, 1, 1, 1, self.features), self.dtype))
            v = bn.variables
            a = (v["params"]["scale"].astype(jnp.float32)
                 * jax.lax.rsqrt(
                     v["batch_stats"]["var"].astype(jnp.float32) + 1e-5))
            bvec = (v["params"]["bias"].astype(jnp.float32)
                    - v["batch_stats"]["mean"].astype(jnp.float32) * a)
            from fbbev_tpu.models.layers import _upsample_int_axis
            from fbbev_tpu.ops.pallas_occ_tail import occ_tail
            import os
            Y, X, Z = target_size
            lv = []
            for f in ys:
                if f.shape[3] != Z:
                    f = _upsample_int_axis(f, 3, Z // f.shape[3])
                if f.shape[1] != Y:
                    f = _upsample_int_axis(f, 1, Y // f.shape[1])
                lv.append(f)
            interp = (None if jax.default_backend() == "tpu" else
                      os.environ.get("FBBEV_FORCE_OCC_TAIL")
                      == "interpret" or None)
            return occ_tail(lv, w.astype(ys[0].dtype), a, bvec, tail_k2,
                            interpret=interp)
        fused = OccHead._fuse_levels(ys, w, target_size, train)
        return nn.relu(bn(fused))


def downsample_gt_mode_pool(target: jnp.ndarray, ratio: int,
                            empty_idx: int = 18,
                            num_classes: int = 19) -> jnp.ndarray:
    """GT mode-pooling for coarse supervision (``occupancy_head.py:217-228``).

    Reproduces the reference's torch code exactly, including its quirks for
    the shipped label convention (0 = noise, 18 = empty):

    * blocks whose label *sum* equals ``empty_idx`` keep their raw labels
      for the mode (the reference's all-empty test, written for the
      OpenOccupancy empty_idx=0 convention);
    * in all other blocks the label-0 voxels are "uniquified" to distinct
      negatives, so they can never win the mode (each has count 1 and
      negatives are smallest), and a block whose non-zero labels are all
      distinct resolves to 255 (ignore);
    * ``torch.mode`` tie-break: the smallest value among the most frequent
      (255 candidates sort after real classes).

    Static-shape TPU formulation: per-block one-hot counts over the
    ``num_classes + 1`` candidate values (classes + 255) instead of a sort.
    """
    B, H, W, D = target.shape
    r = ratio
    t = target.reshape(B, H // r, r, W // r, r, D // r, r)
    t = jnp.transpose(t, (0, 1, 3, 5, 2, 4, 6)).reshape(
        B, H // r, W // r, D // r, r ** 3)
    t = t.astype(jnp.int32)
    blk_sum = t.sum(-1)
    raw_block = blk_sum == empty_idx  # zeros NOT uniquified in these

    values = jnp.concatenate([jnp.arange(num_classes, dtype=jnp.int32),
                              jnp.asarray([255], jnp.int32)])
    cnt = (t[..., None, :] == values[:, None]).sum(-1)  # (..., V)
    has_zero = cnt[..., 0] > 0
    eff = cnt.at[..., 0].multiply(raw_block.astype(cnt.dtype))
    max_eff = eff.max(-1)
    # argmax = first (smallest) most-frequent value = torch.mode tie-break
    mode_label = values[jnp.argmax(eff, axis=-1)]
    negative_wins = jnp.logical_and(
        jnp.logical_not(raw_block),
        jnp.logical_and(has_zero, max_eff <= 1))
    return jnp.where(negative_wins, 255, mode_label)


def occ_losses(logits: jnp.ndarray, target: jnp.ndarray,
               class_weights: jnp.ndarray, dist_weight: jnp.ndarray,
               empty_idx: int = 18, use_focal: bool = True):
    """The four voxel losses (``occupancy_head.py:213-257``), tag c_0.

    When the target resolution exceeds the logits resolution the GT is
    mode-pooled first (``occupancy_head.py:217-228``)."""
    ratio = target.shape[1] // logits.shape[1]
    if ratio != 1:
        target = downsample_gt_mode_pool(target, ratio, empty_idx)
    logits = jnp.nan_to_num(logits, nan=0.0, posinf=0.0, neginf=0.0)
    out = {}
    if use_focal:
        out["loss_voxel_ce_c_0"] = L.focal_ce_loss(
            logits, target, class_weights, dist_weight)
    else:
        out["loss_voxel_ce_c_0"] = L.ce_ssc_loss(
            logits, target, class_weights)
    out["loss_voxel_sem_scal_c_0"] = L.sem_scal_loss(logits, target)
    out["loss_voxel_geo_scal_c_0"] = L.geo_scal_loss(
        logits, target, non_empty_idx=empty_idx)
    out["loss_voxel_lovasz_c_0"] = L.lovasz_softmax_loss(logits, target)
    return out
