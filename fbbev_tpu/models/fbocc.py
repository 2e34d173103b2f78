"""FBOCC detector: the full forward-backward BEV occupancy pipeline.

Parity reference: ``FBOCC``
(``/root/reference/mmdet3d/models/fbbev/detectors/fbocc.py:44-606``).

TPU-native redesign of the statefulness: the reference keeps the temporal
history as *mutable module attributes* (``history_bev/seq_ids/sweep_time/
forward_augs``, :128-133) updated in-place each call.  Here the history is
an explicit :class:`TemporalState` carried through the (jitted, purely
functional) step: ``(params, state, batch) -> (outputs, new_state)`` --
scan-friendly, checkpointable, shardable.

Pipeline per frame (cf. ``extract_img_bev_feat``, :322-376):
  image encoder (ResNet+FPN) -> camera-aware DepthNet -> LSS forward
  projection (voxel pool) -> BEVFormer backward projection (depth-aware
  deformable attention) -> readd fuse -> SoloFusion 16-frame temporal
  fusion (ego-warped ring buffer) -> 3D BEV encoder -> occupancy head.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fbbev_tpu import geometry
from fbbev_tpu.models import depth_net as depth_net_lib
from fbbev_tpu.models.bevformer import BackwardProjection
from fbbev_tpu.models.depth_net import CM_DepthNet
from fbbev_tpu.models.fpn import CustomFPN
from fbbev_tpu.models.fpn3d import FPN3D

from fbbev_tpu.models.lss import LSSViewTransformer3D
from fbbev_tpu.models.occ_head import OccHead
from fbbev_tpu.models.resnet import ResNet
from fbbev_tpu.models.resnet3d import CustomResNet3D
from fbbev_tpu.ops.grid_sample import grid_sample_3d, grid_sample_3d_tiled
from fbbev_tpu.registry import DETECTORS


def _bev_spec() -> tuple:
    """Partition spec for BEV-stage (B, Y, X, ...) pins.

    Batch -> 'data'; the BEV Y axis -> 'space', so every BEV conv / head
    runs on Y-slices with GSPMD halo exchanges (a no-op on space=1
    meshes, where 'space' only shards cameras in the image stages).
    DEFAULT since the round-5 flagship AOT pricing: a (data=4, space=2)
    mesh lands at 0.1401x per-device compiled flops vs the 0.125 ideal
    (MULTICHIP_FLAGSHIP_SPACE.json; round-3's replicated-BEV layout
    measured 0.217x at the toy shape).  ``FBBEV_BEV_SPACE_SHARD=0``
    restores the replicate-along-'space' layout."""
    import os
    if os.environ.get("FBBEV_BEV_SPACE_SHARD", "1") == "1":
        return ("data", "space")
    return ("data",)


class TemporalState(NamedTuple):
    """SoloFusion history ring buffer, an explicit functional carry.

    ``history_bev`` is stored Z-MAJOR -- (B, Z, Y, X, T*C) -- the layout
    both warp formulations consume, so no per-frame relayout is ever paid
    (the reference stores (B, T*C, Z, Y, X) contiguous for the same
    reason, ``fbocc.py:252-275``).  Frame-slot semantics differ by path:

    * XLA fallback (training / non-TPU): age-ordered channels exactly like
      the reference (slot 0 = newest), shifted by C channels per frame;
    * fused Pallas path (TPU eval): FIXED ring slots -- the oldest slot is
      overwritten in place and ``sweep_time`` carries each slot's age
      (see ops/pallas_fuse_warp.py).  Both carry the same (age -> tensor)
      multiset; a state stream is only ever consumed by the path that
      produced it.
    """

    history_bev: jnp.ndarray     # (B, Z, Y, X, T*C), stop-gradient'd
    sweep_time: jnp.ndarray      # (B, T) frames-ago counters
    seq_ids: jnp.ndarray         # (B,) scene-stream ids
    forward_augs: jnp.ndarray    # (B, 4, 4) BDA of the buffered frames


def init_temporal_state(batch: int, grid_size: Tuple[int, int, int],
                        history_cat_num: int = 16,
                        channels: int = 80,
                        dtype=jnp.float32) -> TemporalState:
    """``dtype`` should match the model compute dtype: the reference's
    history BEV is an fp16 activation under AMP (``fbocc.py:252-320``), so
    bf16 models carry a bf16 history (halves the ~328 MB/frame of
    history-state traffic, docs/PERF.md r2)."""
    nx, ny, nz = grid_size
    return TemporalState(
        history_bev=jnp.zeros(
            (batch, nz, ny, nx, history_cat_num * channels), dtype),
        sweep_time=jnp.zeros((batch, history_cat_num), jnp.float32),
        seq_ids=jnp.full((batch,), -1, jnp.int32),
        forward_augs=jnp.broadcast_to(jnp.eye(4), (batch, 4, 4)),
    )


DEFAULT_GRID_CONFIG = {
    "x": (-40.0, 40.0, 0.8),
    "y": (-40.0, 40.0, 0.8),
    "z": (-1.0, 5.4, 0.8),
    "depth": (2.0, 42.0, 0.5),
}

DEFAULT_BEVFORMER_GRID = {
    "x": (-40.0, 40.0, 0.8),
    "y": (-40.0, 40.0, 0.8),
    "z": (-1.0, 5.4, 1.6),
}


def make_backward_projection(model: "FBOCC") -> BackwardProjection:
    """BackwardProjection head for an FBOCC config.

    A module-level function (NOT a method): flax registers modules
    constructed inside module *methods* as children of the enclosing
    module, which fails on unbound instances — and serving needs to build
    this outside apply() to precompute the rig-static terms
    (:meth:`BackwardProjection.static_terms`).  ``setup`` uses it too so
    there is exactly one construction site.
    """
    gc = model.grid_config or DEFAULT_GRID_CONFIG
    fp = model.make_forward_projection()
    return BackwardProjection(
        bev_h=int(fp.nx[1]),
        bev_w=int(fp.nx[0]),
        embed_dims=model.single_bev_num_channels,
        feedforward_channels=model.single_bev_num_channels * 4,
        pos_num_feats=model.single_bev_num_channels // 2,
        pc_range=model.pc_range,
        grid_config=model.bevformer_grid_config or DEFAULT_BEVFORMER_GRID,
        input_size=model.input_size,
        dbound=tuple(gc["depth"]),
        max_queries_per_cam=model.max_queries_per_cam,
        dtype=model.dtype, remat=model.remat)


@DETECTORS.register
class FBOCC(nn.Module):
    """Flagship FB-OCC model (R50, 16-frame, occupancy head)."""

    grid_config: Any = None
    bevformer_grid_config: Any = None
    input_size: Tuple[int, int] = (256, 704)
    downsample: int = 16
    num_cams: int = 6
    backbone_type: str = "ResNet"  # ResNet | VoVNetCP | ConvNeXt
    backbone_depth: int = 50       # ResNet depth
    backbone_arch: str = "V-99-eSE"  # VoVNet spec / ConvNeXt arch
    img_feat_channels: int = 256
    single_bev_num_channels: int = 80
    depth_channels: int = 80
    # CM_DepthNet trunk width (reference default 512,
    # cm_depthnet.py mid_channels); configurable so size-reduced
    # configs (the multichip dryrun) don't carry a 25M-param depth net
    depth_mid_channels: int = 512
    history_cat_num: int = 16
    history_cat_conv_out_channels: int = 160
    readd: bool = True
    num_classes: int = 19
    use_backward_projection: bool = True
    use_depth_supervision: bool = True
    use_occupancy_head: bool = True
    # static per-camera rebatch size for backward projection (None = dense)
    max_queries_per_cam: int = 4096
    # locality-tiled history warp (docs/PERF.md); plain gather warp if False
    use_tiled_warp: bool = True
    # optional FB-BEV detection path (CenterPoint head on the z-collapsed
    # BEV; pts_bbox_head=None in the shipped FB-OCC config)
    use_detection_head: bool = False
    voxel_channels: Tuple[int, ...] = (64, 128, 256)
    voxel_out_channels: int = 256
    pc_range: Tuple[float, ...] = (-40, -40, -1.0, 40, 40, 5.4)
    dtype: Any = jnp.float32
    remat: bool = False

    def make_forward_projection(self) -> LSSViewTransformer3D:
        """Parameter-free LSS transformer; safe to build outside apply()
        (serving / trainer need its grid metadata)."""
        return LSSViewTransformer3D(
            grid_config=self.grid_config or DEFAULT_GRID_CONFIG,
            input_size=self.input_size, downsample=self.downsample)

    def setup(self):
        gc = self.grid_config or DEFAULT_GRID_CONFIG
        if self.backbone_type == "ResNet":
            self.img_backbone = ResNet(
                depth=self.backbone_depth, out_indices=(2, 3),
                dtype=self.dtype, remat=self.remat, name="img_backbone")
            neck_in = ((256 * 4, 512 * 4) if self.backbone_depth >= 50
                       else (256, 512))
        elif self.backbone_type == "VoVNetCP":
            from fbbev_tpu.models.vovnet import STAGE_SPECS, VoVNetCP
            self.img_backbone = VoVNetCP(
                spec_name=self.backbone_arch, out_indices=(2, 3),
                dtype=self.dtype, remat=self.remat, name="img_backbone")
            ch = STAGE_SPECS[self.backbone_arch]["stage_out_ch"]
            neck_in = (ch[2], ch[3])
        elif self.backbone_type == "ConvNeXt":
            from fbbev_tpu.models.convnext import SPECS, ConvNeXt
            self.img_backbone = ConvNeXt(
                arch=self.backbone_arch, out_indices=(2, 3),
                dtype=self.dtype, name="img_backbone")
            dims = SPECS[self.backbone_arch]["dims"]
            neck_in = (dims[2], dims[3])
        elif self.backbone_type == "DLANet":
            from fbbev_tpu.models.dla import SPECS as DLA_SPECS
            from fbbev_tpu.models.dla import DLANet
            self.img_backbone = DLANet(
                arch=self.backbone_arch, out_indices=(4, 5),
                dtype=self.dtype, name="img_backbone")
            ch = DLA_SPECS[self.backbone_arch]["channels"]
            neck_in = (ch[4], ch[5])
        elif self.backbone_type == "SwinTransformer":
            from fbbev_tpu.models.swin import SPECS as SWIN_SPECS
            from fbbev_tpu.models.swin import SwinTransformer
            self.img_backbone = SwinTransformer(
                arch=self.backbone_arch, out_indices=(2, 3),
                dtype=self.dtype, name="img_backbone")
            e = SWIN_SPECS[self.backbone_arch]["embed"]
            neck_in = (e * 4, e * 8)
        else:
            raise KeyError(self.backbone_type)
        self.img_neck = CustomFPN(
            in_channels=neck_in,
            out_channels=self.img_feat_channels, out_ids=(0,),
            dtype=self.dtype, name="img_neck")
        self.depth_net = CM_DepthNet(
            in_channels=self.img_feat_channels,
            mid_channels=self.depth_mid_channels,
            context_channels=self.single_bev_num_channels,
            depth_channels=self.depth_channels,
            downsample=self.downsample,
            depth_bounds=tuple(gc["depth"]),
            dtype=self.dtype, name="depth_net")
        self.forward_projection = self.make_forward_projection()
        if self.use_backward_projection:
            # auto-named by the attribute -> same param tree as before
            self.backward_projection = make_backward_projection(self)
        # NOTE: no remat on the 3D encoder -- nn.remat x bf16 x the z-slab
        # conv decomposition crashes the v5e worker at execution on
        # 100x100x8 grids (standalone bisect matrix, docs/ROUND2.md:
        # each pairwise combination passes, all three together fault).
        # Activations here are small, so remat buys little anyway; the
        # image backbone keeps remat (where the memory actually is).
        self.img_bev_encoder_backbone = CustomResNet3D(
            block_inplanes=tuple(self.voxel_channels),
            block_strides=(1, 2, 2), out_indices=(0, 1, 2),
            dtype=self.dtype, remat=False,
            name="img_bev_encoder_backbone")
        self.img_bev_encoder_neck = FPN3D(
            in_channels=tuple(self.voxel_channels),
            out_channels=self.voxel_out_channels, dtype=self.dtype,
            name="img_bev_encoder_neck")
        if self.use_occupancy_head:
            self.occupancy_head = OccHead(
                in_channels=(self.voxel_out_channels,) * 3,
                out_channel=self.num_classes, num_level=3,
                dtype=self.dtype, name="occupancy_head")
        if self.use_detection_head:
            from fbbev_tpu.models.centerpoint_head import CenterHead
            self.pts_bbox_head = CenterHead(
                in_channels=self.voxel_out_channels, dtype=self.dtype,
                name="pts_bbox_head")
        # temporal fusion convs (fbocc.py:110-127); the cat conv accepts a
        # per-sample weight-row permutation (ring-slot -> age order) for
        # the fused Pallas fuse_history path, param tree unchanged
        from fbbev_tpu.models.layers import RingCatConvBN, TimeEmbedConvBN
        self.history_keyframe_time_conv = TimeEmbedConvBN(
            self.single_bev_num_channels, dtype=self.dtype,
            name="history_time_conv")
        self.history_keyframe_cat_conv = RingCatConvBN(
            self.history_cat_conv_out_channels, dtype=self.dtype,
            name="history_cat_conv")

    # ------------------------------------------------------------------
    def image_encoder(self, imgs, train: bool):
        """(B, N, H, W, 3) -> (B, N, fH, fW, C) single-level features."""
        B, N, H, W, C = imgs.shape
        x = imgs.reshape(B * N, H, W, C).astype(self.dtype)
        feats = self.img_backbone(x, train)
        x = self.img_neck(feats, train)[0]
        fh, fw, fc = x.shape[1:]
        return x.reshape(B, N, fh, fw, fc)

    # ------------------------------------------------------------------
    def fuse_history(self, curr_bev, state: TemporalState, meta,
                     bda, do_history=True, train: bool = False):
        """SoloFusion temporal fusion (``fbocc.py:207-319``), functional.

        Args:
          curr_bev: (B, Y, X, Z, C) current fused BEV volume (f32).
          state: previous :class:`TemporalState`.
          meta: dict with ``start_of_sequence`` (B,) bool,
            ``sequence_group_idx`` (B,) int32,
            ``curr_to_prev_ego_rt`` (B, 4, 4).
          bda: (B, 3, 3) current BEV augmentation.
          do_history: python or traced bool; when False every sample is
            treated as a fresh stream (reference resets the buffer by
            setting ``history_bev=None``, :317-318).

        Returns: (fused (B, Y, X, Z, C_out), new_state, seq_mismatch (B,)).
        """
        # history math runs in the model compute dtype (the reference's
        # history BEV is an fp16 activation under AMP); f32 models keep
        # exact f32 history semantics
        curr_bev = curr_bev.astype(self.dtype)
        B, ny, nx, nz, C = curr_bev.shape
        T = self.history_cat_num
        start = meta["start_of_sequence"].astype(bool)
        if isinstance(do_history, bool):
            if not do_history:
                start = jnp.ones_like(start)
        else:
            start = jnp.logical_or(start, jnp.logical_not(do_history))
        # also reset any slot whose state has never been written
        start = jnp.logical_or(start, state.seq_ids < 0)

        seq_ids = meta["sequence_group_idx"].astype(jnp.int32)
        forward_augs = geometry.forward_aug_matrix(bda.astype(jnp.float32))
        curr_to_prev = meta["curr_to_prev_ego_rt"].astype(jnp.float32)

        # sampler contract check (fbocc.py:248): non-start samples must
        # continue the same stream.  Returned as a diagnostic (asserting
        # inside jit is not possible).
        seq_mismatch = jnp.logical_and(
            jnp.logical_not(start), state.seq_ids != seq_ids)

        # per-slot ages of the buffered frames, after this step's aging
        sweep_r = jnp.where(start[:, None], 0.0, state.sweep_time + 1.0)
        hist_augs = jnp.where(start[:, None, None], forward_augs,
                              state.forward_augs)

        fp = self.forward_projection
        f2b = jnp.asarray(geometry.feat2bev_matrix(fp.dx, fp.bx))
        import os
        from fbbev_tpu.ops import pallas_fuse_warp, pallas_warp
        on_tpu = jax.devices()[0].platform == "tpu"
        # test hook: FBBEV_FORCE_FUSE_WARP=interpret runs the fused kernel
        # through the Pallas interpreter on any platform
        interpret = (not on_tpu and
                     os.environ.get("FBBEV_FORCE_FUSE_WARP") == "interpret")
        # DEFAULT-ON since the round-4 on-chip A/B (docs/ROUND4.md):
        # serving 26.5 -> 26.68 fps with the fused kernel; equivalence
        # pinned by tests/test_fuse_warp.py.  FBBEV_FUSE_WARP=0 opts out.
        if (self.use_tiled_warp and not train and (on_tpu or interpret)
                and (os.environ.get("FBBEV_FUSE_WARP", "1") == "1"
                     or interpret)
                and os.environ.get("FBBEV_DISABLE_FUSE_WARP") != "1"
                and pallas_fuse_warp.supports(
                    state.history_bev.shape, C=C,
                    itemsize=jnp.dtype(self.dtype).itemsize)):
            # Fused Pallas path: one kernel does layout-free warp +
            # start-reset + ring-slot update + concat (docs/PERF.md r3).
            # Frames live in fixed ring slots; `perm` restores age order
            # at the cat conv by permuting its weight rows.
            mat = pallas_warp.flow_matrix_from_grid_args(
                hist_augs, forward_augs, curr_to_prev, f2b)
            # start samples: the kernel replaces every slot with the
            # UNWARPED curr; force the identity flow so this matches the
            # fallback's warp-of-tiled-curr (datasets set
            # curr_to_prev_ego_rt = eye on sequence starts, under which
            # the flow is exactly the identity -- data/nuscenes.py
            # _temporal_meta, reference nuscenes_dataset.py:364-381)
            eye4 = jnp.broadcast_to(jnp.eye(4, dtype=mat.dtype), mat.shape)
            mat = jnp.where(start[:, None, None], eye4, mat)
            hsel = jnp.argmax(sweep_r, axis=1).astype(jnp.int32)  # oldest
            hist = jax.lax.stop_gradient(
                state.history_bev.astype(self.dtype))
            new_sweep = jnp.where(
                jnp.arange(T)[None, :] == hsel[:, None], 0.0, sweep_r)
            # cat-conv weight rows permuted from ring-slot order back to
            # the reference's age order
            ranks = jnp.argsort(jnp.argsort(sweep_r, axis=1,
                                            stable=True), axis=1)
            slot_rows = ((ranks + 1)[:, :, None] * C
                         + jnp.arange(C)[None, None, :]).reshape(B, T * C)
            curr_rows = jnp.broadcast_to(jnp.arange(C)[None, :], (B, C))
            # time-embedding conv on curr (shared weights with the slots'
            # time conv; also instantiates conv/bn so the folded terms
            # below are readable during init)
            y1_c = self.history_keyframe_time_conv(
                curr_bev, jnp.zeros((B, 1, 1, 1, 1), jnp.float32), train)
            # DEFAULT-ON since the round-5 on-chip A/B (/tmp/ab_r5b.jsonl,
            # docs/ROUND5.md session 4): 29.08 -> 31.32 fps.  =0 opts out.
            if os.environ.get("FBBEV_FUSE_WARP_EPI", "1") == "1":
                # fused epilogue (docs/ROUND4.md session 4): the warped
                # slots' time conv (eval BN folded) + their cat-conv
                # contribution run inside the warp kernel; the 1280-ch
                # slots tensor and its 1280-ch relu'd image never reach
                # HBM.  Exact in eval mode (running-stat BN folds into
                # the conv; tests/test_fuse_warp.py pins the stream).
                tv = self.history_keyframe_time_conv.variables
                kf = tv["params"]["conv"]["kernel"].reshape(
                    C + 1, C).astype(jnp.float32)
                cbias = tv["params"]["conv"]["bias"].astype(jnp.float32)
                g = tv["params"]["bn"]["scale"].astype(jnp.float32)
                beta = tv["params"]["bn"]["bias"].astype(jnp.float32)
                mu = tv["batch_stats"]["bn"]["mean"].astype(jnp.float32)
                var = tv["batch_stats"]["bn"]["var"].astype(jnp.float32)
                s = g * jax.lax.rsqrt(var + 1e-5)
                epi = dict(kc=kf[:C] * s[None, :], ke=kf[C] * s,
                           kb=cbias * s + beta - mu * s,
                           tvec=sweep_r * 0.5)

                def slots_fn(ws):
                    return pallas_fuse_warp.fuse_warp(
                        hist, curr_bev, mat, start, hsel,
                        interpret=interpret,
                        epilogue=dict(epi, ws=ws))

                fused, new_hist = self.history_keyframe_cat_conv(
                    T * C, train, perm=slot_rows.astype(jnp.int32),
                    x2=y1_c, perm2=curr_rows.astype(jnp.int32),
                    slots_fn=slots_fn)
            else:
                slots, new_hist = pallas_fuse_warp.fuse_warp(
                    hist, curr_bev, mat, start, hsel, interpret=interpret)
                # time-embedding conv applied to the slots and curr
                # SEPARATELY (same weights; the (T+1)-frame concat never
                # materialises) -- see the frame-fold note in the
                # fallback branch below
                frames_s = slots.reshape(B, ny, nx, nz * T, C)
                temb_s = jnp.broadcast_to(
                    (sweep_r * 0.5)[:, None, :], (B, nz, T)).reshape(
                    B, 1, 1, nz * T, 1)
                y1_s = self.history_keyframe_time_conv(
                    frames_s, temb_s, train).reshape(B, ny, nx, nz, T * C)
                fused = self.history_keyframe_cat_conv(
                    y1_s, train, perm=slot_rows.astype(jnp.int32),
                    x2=y1_c, perm2=curr_rows.astype(jnp.int32))
        else:
            # XLA fallback (training / non-TPU): age-ordered channels,
            # exactly the reference's formulation (fbocc.py:207-319)
            s5 = start[:, None, None, None, None]
            curr_zyx = jnp.transpose(curr_bev, (0, 3, 1, 2, 4))
            tiled_curr = jnp.tile(curr_zyx, (1, 1, 1, 1, T))
            hist_zyx = jnp.where(s5, tiled_curr,
                                 state.history_bev.astype(self.dtype))
            hist_zyx = jax.lax.stop_gradient(hist_zyx)
            if (self.use_tiled_warp and not train and on_tpu
                    and os.environ.get("FBBEV_DISABLE_PALLAS_WARP") != "1"
                    and pallas_warp.supports(hist_zyx.shape)):
                # standalone Pallas warp (A/B path when the fused kernel
                # is disabled): exact trilinear tent-product on the MXU
                mat = pallas_warp.flow_matrix_from_grid_args(
                    hist_augs, forward_augs, curr_to_prev, f2b)
                sampled = pallas_warp.warp_affine_3d(
                    hist_zyx, mat, out_zyx=False).astype(self.dtype)
            else:
                grid = geometry.history_flow_grid(
                    hist_augs, forward_augs, curr_to_prev, f2b,
                    (nz, ny, nx))
                # the tiled warp materialises per-tile source slabs
                # (~1.6 GB at flagship scale) -- a large constant on the
                # training-graph memory high-water mark; training uses the
                # gather warp instead
                if (self.use_tiled_warp and not train
                        and ny % 4 == 0 and nx % 4 == 0):
                    # exact trilinear via locality tiling (docs/PERF.md):
                    # valid for the ego-motion warp (rotation bounded by
                    # the +-22.5deg BDA augs and frame-to-frame yaw)
                    sampled = grid_sample_3d_tiled(
                        hist_zyx, grid, align_corners=True, tile=4,
                        slab_xy=8)
                else:
                    sampled = grid_sample_3d(hist_zyx, grid,
                                             align_corners=True)
                sampled = jnp.transpose(sampled, (0, 2, 3, 1, 4)).astype(
                    self.dtype)  # (B,Y,X,Z,TC)

            # re-pin the batch sharding: the warp gather defeats GSPMD
            # propagation (see parallel/mesh.py)
            from fbbev_tpu.parallel import pshard
            sampled = pshard(sampled, *_bev_spec())
            feats_cat = jnp.concatenate([curr_bev, sampled], -1)  # (1+T)C
            sweep_full = jnp.concatenate(
                [jnp.zeros((B, 1), jnp.float32), sweep_r], axis=1)
            new_sweep = sweep_full[:, :-1]
            new_hist = jax.lax.stop_gradient(jnp.transpose(
                feats_cat[..., : T * C], (0, 3, 1, 2, 4)))

            # per-keyframe time-embedding conv.  A 1x1x1 conv mixes no
            # spatial positions, so the frame axis is folded into Z
            # instead of batch: (B,Y,X,Z,(T+1)C) -> (B,Y,X,Z(T+1),C) is a
            # pure reshape (z-major, frame-minor is already the memory
            # order), where the reference's batch-fold (fbocc.py:303-310
            # upstream) costs two full moveaxis copies of the 17x80ch
            # volume (~4 ms/frame measured).  BatchNorm statistics reduce
            # over all non-channel axes either way, so semantics and
            # parameter layout are unchanged.
            frames = feats_cat.reshape(B, ny, nx, nz * (T + 1), C)
            t_emb = jnp.broadcast_to(
                (sweep_full * 0.5)[:, None, :], (B, nz, T + 1)).reshape(
                B, 1, 1, nz * (T + 1), 1)
            # the 1-channel time embedding is folded into the conv
            # algebraically (TimeEmbedConvBN) instead of concatenated --
            # the concat rewrote ~220 MB of HBM per frame for one channel
            frames = self.history_keyframe_time_conv(frames, t_emb, train)
            frames = frames.reshape(B, ny, nx, nz, (T + 1) * C)
            fused = self.history_keyframe_cat_conv(frames, train)

        new_state = TemporalState(
            history_bev=jax.lax.stop_gradient(new_hist),
            sweep_time=new_sweep,
            seq_ids=seq_ids,
            forward_augs=forward_augs,
        )
        return fused, new_state, seq_mismatch

    # ------------------------------------------------------------------
    def __call__(self, batch: Dict[str, Any], state: TemporalState,
                 train: bool = False,
                 do_history=True) -> Tuple[Dict[str, Any], TemporalState]:
        """One frame through the full pipeline.

        ``batch``: imgs (B, N, H, W, 3); cam params (rots/trans/intrins/
        post_rots/post_trans/bda); temporal meta (start_of_sequence,
        sequence_group_idx, curr_to_prev_ego_rt).
        """
        cam = geometry.CamParams(
            rots=batch["rots"], trans=batch["trans"],
            intrins=batch["intrins"], post_rots=batch["post_rots"],
            post_trans=batch["post_trans"], bda=batch["bda"])

        feats = self.image_encoder(batch["imgs"], train)
        mlp_input = depth_net_lib.get_mlp_input(cam)
        context, depth = self.depth_net(feats, mlp_input, train)

        # pshard: batch-axis sharding hints for the ('data', 'space') mesh;
        # no-ops single-device.  Without them GSPMD loses the batch
        # sharding at the pool scatter / warp gather and replicates every
        # downstream stage on all devices (see parallel/mesh.py).
        # FBBEV_BEV_SPACE_SHARD=1 additionally pins the BEV Y axis to
        # 'space' (image stages shard cameras over 'space'; the BEV
        # stages otherwise replicate along it -- docs/PERF.md round 3).
        # GSPMD inserts the conv halo exchanges automatically.
        from fbbev_tpu.parallel import pshard
        spec = _bev_spec()
        bev_feat = pshard(self.forward_projection(cam, context, depth),
                          *spec)

        outputs: Dict[str, Any] = {"depth": depth, "context": context}
        if self.use_backward_projection:
            lss_bev = jnp.mean(bev_feat, axis=3)  # z-collapse (B, Y, X, C)
            refined = pshard(self.backward_projection(
                context, lss_bev.astype(self.dtype), cam, depth, train),
                *spec)
            bev_feat = refined.astype(jnp.float32)[:, :, :, None, :] \
                + bev_feat
            outputs["bev_refined"] = refined

        fused, new_state, seq_mismatch = self.fuse_history(
            bev_feat, state, batch, cam.bda, do_history, train)
        fused = pshard(fused, *spec)
        outputs["seq_mismatch"] = seq_mismatch

        x = self.img_bev_encoder_backbone(fused.astype(jnp.float32), train)
        voxel_feats = [pshard(v, *spec)
                       for v in self.img_bev_encoder_neck(x, train)]
        if self.use_occupancy_head:
            logits = pshard(self.occupancy_head(voxel_feats, train), *spec)
            outputs["occ_logits"] = logits  # (B, Y, X, Z, num_classes)
        if self.use_detection_head:
            # z-collapse by folding Z into channels (design choice for the
            # 3D pipeline; the reference detection configs use a 2D BEV)
            v0 = voxel_feats[0]
            B2, ny2, nx2, nz2, c2 = v0.shape
            bev2d = v0.reshape(B2, ny2, nx2, nz2 * c2)
            outputs["det_preds"] = self.pts_bbox_head(bev2d, train)
        return outputs, new_state
