"""Fixed-rig streaming inference pipeline -- the TPU-native replacement of
the reference's TensorRT deployment layer (``/root/reference/deployment/``).

The reference exports an ONNX graph with all camera-geometry index math
hoisted out (``fbocc_trt.py:30-76``) because the rig is fixed at runtime.
Here the same hoisting happens naturally: the host precomputes the voxel
ranks for the calibrated rig once (C++ helper), and the jitted step takes
images + precomputed ranks + the temporal state, producing occupancy
predictions.  No export step: the serving artifact IS the jitted function
plus a checkpoint.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fbbev_tpu import geometry
from fbbev_tpu.models.fbocc import FBOCC, TemporalState, init_temporal_state


class FixedRigPipeline:
    """Streaming 6-camera occupancy inference for one calibrated rig."""

    def __init__(self, model: FBOCC, variables: Dict[str, Any],
                 cam: geometry.CamParams, use_host_ranks: bool = True):
        self.model = model
        self.variables = variables
        self.cam = jax.tree.map(jnp.asarray, cam)
        fp = model.make_forward_projection()
        self.grid = tuple(int(n) for n in fp.nx)
        B = int(cam.trans.shape[0])
        self.batch = B

        # rig-static backward-projection precompute (the reference's deploy
        # graph hoists reference points / bev masks / rebatch indices the
        # same way, fbocc_trt.py:42-76): computed ONCE here, passed to the
        # jitted step as device inputs instead of being rebuilt every frame
        self.bwd_terms = None
        if model.use_backward_projection:
            from fbbev_tpu.models.fbocc import make_backward_projection
            feat_hw = (model.input_size[0] // model.downsample,
                       model.input_size[1] // model.downsample)
            self.bwd_terms = jax.tree.map(
                jnp.asarray,
                make_backward_projection(model).static_terms(
                    self.cam, num_depth_bins=model.depth_channels,
                    feat_hw=feat_hw))
        # camera MLP vector is rig-static too (depth_net.py:369-393)
        from fbbev_tpu.models import depth_net as dn
        self.mlp_input = jnp.asarray(dn.get_mlp_input(self.cam))

        self.ranks_bev = None
        self.pool_plan = None
        if use_host_ranks:
            coor = np.asarray(geometry.frustum_to_ego(
                jnp.asarray(fp.frustum), self.cam))
            P = coor.size // 3
            from fbbev_tpu.ops import host_lib
            batch_idx = np.repeat(
                np.arange(B, dtype=np.int32), P // B)
            ranks = host_lib.compute_voxel_ranks(
                coor.reshape(-1, 3), batch_idx, fp.grid_lower,
                fp.grid_interval, self.grid, B)
            self.ranks_bev = jnp.asarray(ranks)
            # Pallas sorted-slab pool (ops/pallas_pool.py): host-planned
            # per-(camera, window) blocks over the static rig geometry.
            # DEFAULT on TPU since the round-4 on-chip A/B (serving
            # 23.04 -> 26.5 fps, docs/ROUND4.md); FBBEV_POOL=xla opts out;
            # FBBEV_FORCE_POOL=interpret exercises it off-TPU (tests).
            import os
            import jax as _jax
            from fbbev_tpu.ops import pallas_pool
            fH = model.input_size[0] // fp.downsample
            fW = model.input_size[1] // fp.downsample
            pool_choice = os.environ.get("FBBEV_POOL", "pallas")
            pool_ok = (_jax.default_backend() == "tpu"
                       or os.environ.get("FBBEV_FORCE_POOL") == "interpret")
            if (pallas_pool.supports(fH, fW,
                                     model.single_bev_num_channels, fp.D)
                    and pool_choice == "pallas" and pool_ok):
                self.pool_plan = pallas_pool.plan_pool(
                    np.asarray(ranks), B, model.num_cams, fp.D, fH, fW,
                    self.grid)

        self.qparams = None  # set by enable_int8()
        self._infer = jax.jit(self._infer_impl)
        self.state = init_temporal_state(
            B, self.grid, model.history_cat_num,
            model.single_bev_num_channels, dtype=model.dtype)

    # ------------------------------------------------------------------
    def _fwd(self, mdl, imgs, meta, state: TemporalState, ranks_bev,
             bwd_terms, mlp_input):
        cam = self.cam
        feats = mdl.image_encoder(imgs, False)
        context, depth = mdl.depth_net(feats, mlp_input, False)
        if self.pool_plan is not None:
            import os
            from fbbev_tpu.ops.pallas_pool import lss_voxel_pool_planned
            bev = lss_voxel_pool_planned(
                self.pool_plan, depth.astype(jnp.float32),
                context.astype(jnp.float32),
                interpret=os.environ.get("FBBEV_FORCE_POOL")
                == "interpret")
        elif ranks_bev is not None:
            from fbbev_tpu.ops.bev_pool import lss_voxel_pool_precomputed
            bev = lss_voxel_pool_precomputed(
                ranks_bev, depth.astype(jnp.float32),
                context.astype(jnp.float32), self.grid)
        else:
            bev = mdl.forward_projection(cam, context, depth)
        if mdl.use_backward_projection:
            lss_bev = jnp.mean(bev, axis=3)
            refined = mdl.backward_projection(
                context, lss_bev.astype(mdl.dtype), cam, depth, False,
                static_terms=bwd_terms)
            bev = refined.astype(jnp.float32)[:, :, :, None, :] + bev
        fused, new_state, _ = mdl.fuse_history(
            bev, state, meta, cam.bda, True, False)
        x = mdl.img_bev_encoder_backbone(fused.astype(jnp.float32),
                                         False)
        vox = mdl.img_bev_encoder_neck(x, False)
        # the head emits the deployment argmax directly (fbocc_trt.py's
        # graph ends in labels too); with FBBEV_OCC_TAIL=1 the whole
        # occ-head tail runs as one Pallas kernel (ops/pallas_occ_tail.py)
        labels = mdl.occupancy_head(vox, False, return_labels=True)
        return labels, new_state

    def _infer_impl(self, variables, imgs, meta, state: TemporalState,
                    ranks_bev, bwd_terms, mlp_input, qparams=None):
        from fbbev_tpu.utils.quantize import quantized_calls

        def fwd(mdl):
            with quantized_calls(qparams):
                return self._fwd(mdl, imgs, meta, state, ranks_bev,
                                 bwd_terms, mlp_input)

        return nn_apply(self.model, variables, fwd)

    # ------------------------------------------------------------------
    def enable_int8(self, calib_frames, calib_metas, exclude=None):
        """Static int8 PTQ for the serving convs (the TPU analogue of the
        reference's reduced-precision TensorRT engines,
        ``deployment/README.md``): calibrate per-tensor activation scales
        over the provided frames, quantize conv weights per-out-channel
        on the host, and route eligible convs through s8 x s8 -> s32 MXU
        convolutions in every subsequent :meth:`__call__`.

        ``calib_frames``: iterable of (B, N, H, W, 3) image arrays;
        ``calib_metas``: matching temporal-meta dicts.  Cost of the
        scheme is priced end-to-end by ``tools/fidelity.py --int8``.
        """
        from fbbev_tpu.utils import quantize as Q
        kw = {} if exclude is None else {"exclude": exclude}
        scales = Q.calibrate_serving(self, calib_frames, calib_metas)
        self._int8_scales = scales  # reusable offline artifact
        self.qparams = Q.build_qparams(self.variables, scales, **kw)
        return self.qparams

    # ------------------------------------------------------------------
    def __call__(self, imgs: np.ndarray, start_of_sequence: bool,
                 curr_to_prev_ego_rt: Optional[np.ndarray] = None):
        """One streaming step. imgs: (B, N, H, W, 3) normalised."""
        B = self.batch
        meta = dict(
            start_of_sequence=jnp.full((B,), start_of_sequence, bool),
            sequence_group_idx=jnp.zeros((B,), jnp.int32),
            curr_to_prev_ego_rt=jnp.asarray(
                curr_to_prev_ego_rt if curr_to_prev_ego_rt is not None
                else np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))),
        )
        pred, self.state = self._infer(
            self.variables, jnp.asarray(imgs), meta, self.state,
            self.ranks_bev, self.bwd_terms, self.mlp_input, self.qparams)
        return pred

    def benchmark(self, iters: int = 20,
                  include_transfer: bool = False) -> float:
        """Returns frames/sec for this pipeline on the current chip.

        ``include_transfer=True`` counts host->device image copies; note
        that over the axon development tunnel H2D runs at ~40 MB/s (a
        13 MB 6-camera frame costs ~350 ms), so the default measures
        device time with pre-staged inputs -- representative of a real
        host where PCIe/DMA feeds the chip.
        """
        rng = np.random.RandomState(0)
        H, W = self.model.input_size
        imgs = [rng.randn(self.batch, self.model.num_cams, H, W, 3)
                .astype(np.float32) for _ in range(3)]
        if not include_transfer:
            imgs = [jnp.asarray(im) for im in imgs]
        pred = self(imgs[0], True)
        np.asarray(pred)
        for im in imgs:
            pred = self(im, False)
        np.asarray(pred)
        t0 = time.perf_counter()
        for i in range(iters):
            pred = self(imgs[i % 3], False)
        np.asarray(pred)
        return self.batch * iters / (time.perf_counter() - t0)


def nn_apply(model, variables, fn):
    """Apply a custom forward over bound module methods."""
    return model.apply(variables, fn, method=_run_bound)


def _run_bound(mdl, fn):
    return fn(mdl)
