"""Training runtime: jitted train step with explicit temporal-state carry,
AdamW + warmup + grad clipping, MEGVII EMA, temporal curriculum.

Replaces the reference's mmcv IterBasedRunner / Fp16OptimizerHook /
MEGVIIEMAHook / SequentialControlHook stack
(``/root/reference/mmdet3d/apis/train.py:183-327``, ``core/hook/``) with a
purely functional step:

    (TrainState, TemporalState, batch) -> (TrainState', TemporalState', metrics)

Recipe parity (config ``fbocc-r50...py:359-394``): AdamW lr 2e-4 wd 1e-2,
linear warmup 200 iters ratio 1e-3, grad-clip L2 max-norm 5, EMA decay
0.999*(1-exp(-n/2000)) from init_updates, temporal fusion enabled after
``temporal_start_iter`` (SequentialControlHook).  Mixed precision: the
reference uses fp16 dynamic loss scaling; on TPU we use bf16 compute
(model ``dtype``) which needs no loss scaling, keeping losses/optimizer
in f32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from fbbev_tpu.models import losses as loss_lib
from fbbev_tpu.models.depth_net import depth_loss
from fbbev_tpu.models.fbocc import DEFAULT_GRID_CONFIG, TemporalState
from fbbev_tpu.models.occ_head import occ_losses


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any
    ema_updates: jnp.ndarray


def lr_schedule(base_lr: float = 2e-4, warmup_iters: int = 200,
                warmup_ratio: float = 1e-3,
                total_iters: Optional[int] = None):
    """Linear warmup then constant (the reference's single step milestone
    sits at the end of training, so the schedule is effectively constant
    after warmup)."""
    warmup = optax.linear_schedule(
        init_value=base_lr * warmup_ratio, end_value=base_lr,
        transition_steps=warmup_iters)
    return optax.join_schedules([warmup, optax.constant_schedule(base_lr)],
                                [warmup_iters])


def make_optimizer(base_lr: float = 2e-4, weight_decay: float = 1e-2,
                   max_grad_norm: float = 5.0, warmup_iters: int = 200,
                   warmup_ratio: float = 1e-3,
                   frozen: Tuple[str, ...] = ()):
    """AdamW + global-norm clip, optionally with frozen submodules.

    ``frozen`` lists top-level param-collection prefixes (module names,
    e.g. ``('img_backbone',)``) whose updates are zeroed — the TPU
    equivalent of the reference's ``requires_grad=False`` freeze options
    (``/root/reference/tools/train.py:245-275``,
    ``freeze_lidar_components`` / ``freeze_depthplugin_components``).
    Clipping and Adam moments see only the trainable subset, matching
    torch where frozen params produce no grads at all.
    """
    inner = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(lr_schedule(base_lr, warmup_iters, warmup_ratio),
                    weight_decay=weight_decay),
    )
    if not frozen:
        return inner
    frozen_set = frozenset(frozen)

    def label_params(params):
        return {k: ("frozen" if k in frozen_set else "train")
                for k in params}

    return optax.multi_transform(
        {"train": inner, "frozen": optax.set_to_zero()}, label_params)


@dataclasses.dataclass
class Trainer:
    """Owns the jitted train/eval steps for an FBOCC-style model."""

    model: Any
    optimizer: Any = None
    ema_base_decay: float = 0.999
    ema_init_updates: int = 0
    depth_loss_weight: float = 1.0
    num_classes: int = 19
    use_depth_supervision: bool = True
    # top-level module names whose params AND BN running stats are frozen
    # (pair with make_optimizer(frozen=...)); mirrors the reference's
    # fix_bn/track_running_stats=False (tools/train.py:251-275)
    frozen: Tuple[str, ...] = ()
    # donate train/temporal state buffers to the step (halves peak param
    # memory; the caller must not reuse pre-step state objects)
    donate_state: bool = False

    def __post_init__(self):
        if self.optimizer is None:
            self.optimizer = make_optimizer()
        self._class_weights = jnp.asarray(
            loss_lib.occ_class_weights(self.num_classes))
        self._dist_weight = None  # lazily sized from the first batch
        donate = (0, 1) if self.donate_state else ()
        # `_mesh` is a hashable cache key only: the active mesh is read at
        # TRACE time (pshard hints / shard_map'd losses), so two calls with
        # identical array shardings but different active meshes must not
        # share a trace
        self._train_step = jax.jit(self._train_step_impl,
                                   static_argnames=("do_history", "_mesh"),
                                   donate_argnums=donate)
        self._eval_step = jax.jit(self._eval_step_impl,
                                  static_argnames=("use_ema", "_mesh"))

    # ------------------------------------------------------------------
    def init_state(self, rng, batch, temporal_state) -> TrainState:
        variables = jax.jit(self.model.init)(rng, batch, temporal_state)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.optimizer.init(params),
            ema_params=jax.tree.map(jnp.copy, params),
            ema_batch_stats=jax.tree.map(jnp.copy, batch_stats),
            ema_updates=jnp.asarray(self.ema_init_updates, jnp.float32),
        )

    # ------------------------------------------------------------------
    def _losses(self, outputs, batch):
        losses = {}
        if "occ_logits" in outputs and "gt_occupancy" in batch:
            logits = outputs["occ_logits"]
            H, W = logits.shape[1], logits.shape[2]
            dist_w = jnp.asarray(loss_lib.bev_distance_weight(H, W))
            losses = self._occ_losses_sharded(logits,
                                              batch["gt_occupancy"], dist_w)
        if "det_preds" in outputs and "gt_boxes" in batch:
            from fbbev_tpu.models.centerpoint_head import (
                NUSCENES_CLASSES, NUSCENES_TASKS, centerpoint_loss,
                centerpoint_targets)
            fp = self.model.make_forward_projection()
            grid = (int(fp.nx[0]), int(fp.nx[1]))
            targets = centerpoint_targets(
                batch["gt_boxes"], batch["gt_labels"], NUSCENES_TASKS,
                NUSCENES_CLASSES, grid,
                self.model.pc_range, (float(fp.dx[0]), float(fp.dx[1])))
            losses.update(centerpoint_loss(outputs["det_preds"], targets))
        if self.use_depth_supervision and "gt_depth" in batch:
            gc = self.model.grid_config or DEFAULT_GRID_CONFIG
            losses["loss_depth"] = depth_loss(
                batch["gt_depth"], outputs["depth"],
                self.model.downsample, gc["depth"],
                self.depth_loss_weight)
        return losses

    def _occ_losses_sharded(self, logits, gt, dist_w):
        """Occupancy losses, per-data-shard under an active mesh.

        The losses sort/reduce over the batch-flattened voxel axis; under
        GSPMD that axis mixes the sharded batch dim, which forces a full
        all-gather and replicates the entire loss (and its backward) on
        every device.  With a mesh active they instead run inside a
        ``shard_map`` over 'data': each shard computes the losses on its
        LOCAL batch and the shards are mean-reduced -- exactly the
        reference's distributed semantics, where every DDP rank computes
        the loss on its local batch and gradients are averaged
        (``/root/reference/mmdet3d/apis/train.py:229-233``; lovasz/sem_scal
        are batch-coupled, so per-rank loss != global-batch loss there
        too).  Single device: identical to the plain call.
        """
        def fn(lg, tg):
            return occ_losses(lg, tg, self._class_weights, dist_w)

        from fbbev_tpu.parallel import active_mesh
        mesh = active_mesh()
        if (mesh is None or "data" not in mesh.shape
                or logits.shape[0] % mesh.shape["data"] != 0):
            return fn(logits, gt)
        from jax.sharding import PartitionSpec as P

        def local(lg, tg):
            return jax.tree.map(lambda v: jax.lax.pmean(v, "data"),
                                fn(lg, tg))

        return jax.shard_map(local, mesh=mesh, in_specs=(P("data"),
                                                         P("data")),
                             out_specs=P())(logits, gt)

    def _train_step_impl(self, state: TrainState,
                         temporal_state: TemporalState,
                         batch: Dict[str, Any], do_history: bool = True,
                         _mesh=None):
        def loss_fn(params):
            (outputs, new_tstate), mutated = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, temporal_state, train=True, do_history=do_history,
                mutable=["batch_stats"])
            losses = self._losses(outputs, batch)
            total = sum(losses.values())
            return total, (losses, new_tstate, mutated["batch_stats"],
                           outputs["seq_mismatch"])

        (total, (losses, new_tstate, new_bs, seq_mismatch)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        if self.frozen:
            # frozen modules keep their running BN stats (the reference's
            # track_running_stats=False, tools/train.py:251-275)
            old_bs = dict(state.batch_stats)
            new_bs = {k: (old_bs[k] if k in self.frozen else v)
                      for k, v in dict(new_bs).items()}

        updates, new_opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        from fbbev_tpu.train.ema import ema_update, megvii_ema_decay
        ema_updates = state.ema_updates + 1.0
        decay = megvii_ema_decay(ema_updates, self.ema_base_decay)
        new_ema_params = ema_update(state.ema_params, new_params, decay)
        new_ema_bs = ema_update(state.ema_batch_stats, new_bs, decay)

        new_state = TrainState(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt_state, ema_params=new_ema_params,
            ema_batch_stats=new_ema_bs, ema_updates=ema_updates)
        metrics = dict(losses)
        metrics["loss_total"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["seq_mismatch"] = jnp.sum(seq_mismatch)
        return new_state, new_tstate, metrics

    def _eval_step_impl(self, state: TrainState,
                        temporal_state: TemporalState,
                        batch: Dict[str, Any], use_ema: bool = True,
                        _mesh=None):
        params = state.ema_params if use_ema else state.params
        bs = state.ema_batch_stats if use_ema else state.batch_stats
        outputs, new_tstate = self.model.apply(
            {"params": params, "batch_stats": bs}, batch, temporal_state,
            train=False, do_history=True)
        return outputs, new_tstate

    # ------------------------------------------------------------------
    def train_step(self, state, temporal_state, batch,
                   do_history: bool = True):
        """One optimizer step.  ``do_history`` is static (flips once at the
        curriculum boundary, costing a single recompile, matching
        SequentialControlHook semantics)."""
        from fbbev_tpu.parallel import active_mesh
        new_state, new_tstate, metrics = self._train_step(
            state, temporal_state, batch, do_history=do_history,
            _mesh=active_mesh())
        return new_state, new_tstate, metrics

    def train_step_lower(self, state, temporal_state, batch,
                         do_history: bool = True):
        """AOT entry: trace + lower the jitted train step (static args
        bound to the active mesh).  Callers chain ``.compile()`` and call
        the result -- lets the multichip dryrun time trace/lower, compile,
        and execute separately."""
        from fbbev_tpu.parallel import active_mesh
        return self._train_step.lower(
            state, temporal_state, batch, do_history=do_history,
            _mesh=active_mesh())

    def eval_step(self, state, temporal_state, batch, use_ema: bool = True):
        from fbbev_tpu.parallel import active_mesh
        return self._eval_step(state, temporal_state, batch, use_ema=use_ema,
                               _mesh=active_mesh())
