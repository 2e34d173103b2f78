"""Config-driven training / evaluation loops.

Replaces the reference's mmcv runner stack (``tools/train.py`` ->
``apis/train.py:183-327`` -> IterBasedRunner + hooks) with an explicit
loop: build everything from the config dict, jit one step, iterate.

The eval loop reproduces ``CustomDistEvalHook`` semantics
(``models/fbbev/utils/eval_hook.py:57-119``): evaluation uses the EMA
weights, streams scenes contiguously per batch slot, and runs with a
fresh temporal state that is discarded afterwards.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fbbev_tpu.config import Config
from fbbev_tpu.data import (
    EvalGroupStreamSampler, InfiniteGroupStreamSampler, SyntheticClipDataset,
    collate)
from fbbev_tpu.evaluation import MIoUMetric, occ_pred_to_cvpr_format
from fbbev_tpu.models import FBOCC
from fbbev_tpu.models.fbocc import init_temporal_state
from fbbev_tpu.train import Trainer, make_optimizer
from fbbev_tpu.train.checkpoints import (
    latest_step, restore_checkpoint, save_checkpoint)

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_model(cfg: Config) -> FBOCC:
    """Accepts both the flat kwargs schema and the reference's nested
    component-dict schema (fbbev_tpu.models.builder)."""
    from fbbev_tpu.models.builder import build_detector
    return build_detector(cfg.model.to_dict()
                          if hasattr(cfg.model, "to_dict")
                          else dict(cfg.model))


def build_dataset(cfg: Config, split: str = "train"):
    d = dict(cfg.data)
    kind = d.pop("type")
    if kind == "SyntheticClipDataset":
        d.pop("batch_size", None)
        return SyntheticClipDataset(**{
            k: tuple(v) if isinstance(v, list) else v for k, v in d.items()})
    if kind == "NuScenesDataset":
        from fbbev_tpu.data import NuScenesDataset
        is_train = split == "train"
        return NuScenesDataset(
            ann_file=d["ann_file_train" if is_train else "ann_file_val"],
            data_config=d["data_config"],
            bda_aug_conf=d.get("bda_aug_conf"),
            occupancy_path=d.get("occupancy_path"),
            grid_config=d.get("grid_config"),
            is_train=is_train,
            sequences_split_num=d.get(
                "train_sequences_split_num" if is_train
                else "test_sequences_split_num", 1),
            load_depth=is_train,
        )
    raise KeyError(kind)


def _grid_size(model: FBOCC):
    gc = model.grid_config
    nx = int(round((gc["x"][1] - gc["x"][0]) / gc["x"][2]))
    ny = int(round((gc["y"][1] - gc["y"][0]) / gc["y"][2]))
    nz = int(round((gc["z"][1] - gc["z"][0]) / gc["z"][2]))
    return (nx, ny, nz)


def batch_iterator(dataset, sampler) -> Iterator[Dict[str, np.ndarray]]:
    for idxs in sampler:
        yield collate([dataset[i] for i in idxs])


def train(cfg: Config, max_iters: Optional[int] = None,
          work_dir: Optional[str] = None,
          resume: bool = False) -> Dict[str, Any]:
    model = build_model(cfg)
    dataset = build_dataset(cfg, "train")
    batch_size = cfg.data.get("batch_size", 2)
    sampler = InfiniteGroupStreamSampler(
        dataset.flag, batch_size, seed=cfg.get("seed", 0))
    it = batch_iterator(dataset, sampler)

    trainer = Trainer(
        model,
        optimizer=make_optimizer(**dict(cfg.optimizer)),
        ema_base_decay=cfg.ema.get("base_decay", 0.999),
        ema_init_updates=cfg.ema.get("init_updates", 0),
        donate_state=True,  # the loop never reuses pre-step state objects
    )

    grid = _grid_size(model)
    tstate = init_temporal_state(
        batch_size, grid, model.history_cat_num,
        model.single_bev_num_channels)
    batch0 = {k: jnp.asarray(v) for k, v in next(it).items()}
    state = trainer.init_state(jax.random.PRNGKey(cfg.get("seed", 0)),
                               batch0, tstate)
    work_dir = work_dir or cfg.get("work_dir", "work_dirs")
    ckpt_dir = os.path.join(work_dir, "ckpts")
    if resume and latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)

    total = max_iters if max_iters is not None else cfg.get("max_iters")
    temporal_start = cfg.get("temporal_start_iter", 0)
    log_interval = cfg.get("log_interval", 50)
    ckpt_interval = cfg.get("checkpoint_interval", 1000)
    history = []
    t0 = time.perf_counter()
    step0 = int(state.step)
    batch = batch0
    for i in range(step0, total):
        do_history = i >= temporal_start
        state, tstate, metrics = trainer.train_step(
            state, tstate, batch, do_history=do_history)
        if int(np.asarray(metrics["seq_mismatch"])) > 0:
            raise RuntimeError(
                "sampler/state contract violated: a non-start-of-sequence "
                "sample continued a different scene stream "
                "(cf. fbocc.py:248 assertion)")
        if (i + 1) % log_interval == 0 or i + 1 == total:
            m = {k: float(np.asarray(v)) for k, v in metrics.items()}
            m["iter"] = i + 1
            m["time_per_iter"] = (time.perf_counter() - t0) / (
                i + 1 - step0)
            history.append(m)
            print(json.dumps({k: round(v, 5) if isinstance(v, float) else v
                              for k, v in m.items()}))
        if (i + 1) % ckpt_interval == 0 or i + 1 == total:
            save_checkpoint(ckpt_dir, state)
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    return {"state": state, "history": history, "trainer": trainer,
            "model": model}


def evaluate(cfg: Config, state=None, trainer=None,
             max_samples: Optional[int] = None,
             use_ema: bool = True,
             work_dir: Optional[str] = None) -> Dict[str, float]:
    """Streaming occupancy evaluation -> per-class IoU + Overall mIoU."""
    model = trainer.model if trainer is not None else build_model(cfg)
    dataset = build_dataset(cfg, "val")
    batch_size = cfg.data.get("batch_size", 2)
    if trainer is None:
        trainer = Trainer(model)
    if state is None:
        ckpt_dir = os.path.join(
            work_dir or cfg.get("work_dir", "work_dirs"), "ckpts")
        grid = _grid_size(model)
        tstate0 = init_temporal_state(
            batch_size, grid, model.history_cat_num,
            model.single_bev_num_channels)
        sample = collate([dataset[0]] * batch_size)
        sample = {k: jnp.asarray(v) for k, v in sample.items()}
        state = trainer.init_state(jax.random.PRNGKey(0), sample, tstate0)
        state = restore_checkpoint(ckpt_dir, state)

    sampler = EvalGroupStreamSampler(dataset.flag, batch_size)
    grid = _grid_size(model)
    tstate = init_temporal_state(
        batch_size, grid, model.history_cat_num,
        model.single_bev_num_channels)
    metric = MIoUMetric()
    det_metric = None
    if model.use_detection_head:
        from fbbev_tpu.evaluation.det_metrics import DetectionMetric
        from fbbev_tpu.models.centerpoint_head import NUSCENES_CLASSES
        det_metric = DetectionMetric(NUSCENES_CLASSES)
    n_done = 0
    for idxs, valid in sampler:
        samples = [dataset[i] for i in idxs]
        batch = collate(samples)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("visible_mask",)}
        outputs, tstate = trainer.eval_step(state, tstate, jb,
                                            use_ema=use_ema)
        logits = (np.asarray(outputs["occ_logits"], np.float32)
                  if "occ_logits" in outputs else None)
        det = None
        if det_metric is not None and "det_preds" in outputs:
            from fbbev_tpu.models.centerpoint_head import (
                NUSCENES_TASKS, centerpoint_decode)
            fp = model.make_forward_projection()
            det = []
            for b in range(batch_size):
                preds_b = jax.tree.map(
                    lambda p: p[b:b + 1], outputs["det_preds"])
                det.append(centerpoint_decode(
                    preds_b, NUSCENES_TASKS, model.pc_range,
                    (float(fp.dx[0]), float(fp.dx[1]))))
        for b, ok in enumerate(valid):
            if not ok:
                continue
            if logits is not None:
                pred = occ_pred_to_cvpr_format(logits[b])
                gt = np.asarray(samples[b].get(
                    "gt_occupancy_cvpr", samples[b].get("gt_occupancy")))
                vis = samples[b].get("visible_mask")
                metric.add_batch(pred, gt, vis)
            if det is not None and "gt_boxes" in samples[b]:
                boxes, scores, labels = (np.asarray(a) for a in det[b])
                det_metric.add_sample(
                    boxes, scores, labels,
                    np.asarray(samples[b]["gt_boxes"]),
                    np.asarray(samples[b]["gt_labels"]))
            n_done += 1
        if max_samples is not None and n_done >= max_samples:
            break
    results = metric.count_miou() if model.use_occupancy_head else {}
    if det_metric is not None:
        results.update(det_metric.compute())
    results["n_samples"] = n_done
    return results
