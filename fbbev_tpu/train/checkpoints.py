"""Orbax checkpointing of the full training state.

Replaces the reference's mmcv CheckpointHook / resume_from / EMA-checkpoint
machinery (``/root/reference/mmdet3d/core/hook/ema.py:114-138``,
``apis/train.py:316-326``):

* the whole :class:`fbbev_tpu.train.trainer.TrainState` (params, batch
  stats, optimizer state, EMA copies, step) is saved atomically;
* EMA weights live inside the state, so there is no separate
  ``epoch_N_ema.pth`` file -- evaluation selects them with ``use_ema``;
* like the reference, the temporal history state is NOT checkpointed
  (``SURVEY.md section 5``: reset on restart by design).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _manager(ckpt_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, state: Any, step: Optional[int] = None,
                    max_to_keep: int = 3) -> None:
    import orbax.checkpoint as ocp

    step = int(state.step) if step is None else int(step)
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(ckpt_dir: str, abstract_state: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the structure of ``abstract_state`` (a concrete or
    eval_shape'd TrainState)."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x,
        abstract_state)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return restored


def latest_step(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step
