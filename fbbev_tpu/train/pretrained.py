"""Warm-start / partial checkpoint loading.

Parity reference: the reference trains the flagship from
``load_from='ckpts/r50_256x705_depth_pretrain.pth'``
(``/root/reference/occupancy_configs/fb_occ/fbocc-r50-cbgs_depth_16f_16x4_20e.py:393``)
and supports key-filtered partial loads ``load_img_from`` /
``load_lidar_from`` (``/root/reference/tools/train.py:277-322``: strip a
``module.`` prefix, keep only ``img_backbone.*`` keys for the img variant,
then ``load_state_dict(strict=False)``).

Here a warm start is: torch ``.pth`` -> :mod:`checkpoint_convert` ->
structural merge into ``TrainState.params`` / ``batch_stats`` with
per-leaf shape checking.  EMA copies are re-seeded from the merged params
(MEGVIIEMAHook snapshots the live model at ``before_run``,
``/root/reference/mmdet3d/core/hook/ema.py:62-99``).  A native ``.npz``
(exported by :func:`save_params_npz`) loads the same way without torch.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import numpy as np


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def _unflatten_into(target, flat: Dict[Tuple[str, ...], Any]):
    """Return a copy of ``target`` (nested dicts) with ``flat`` leaves
    substituted."""
    import copy
    out = copy.deepcopy(jax.tree.map(lambda x: x, target))

    def setpath(tree, path, value):
        for p in path[:-1]:
            tree = tree[p]
        tree[path[-1]] = value

    for path, v in flat.items():
        setpath(out, path, v)
    return out


def load_variables(path: str) -> Dict[str, Any]:
    """Load pretrained variables from a torch ``.pth`` (converted) or a
    ``.npz`` of ``/``-joined flat paths."""
    if path.endswith(".npz"):
        data = np.load(path)
        tree: Dict[str, Any] = {}
        for key in data.files:
            parts = key.split("/")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[key]
        return tree
    from fbbev_tpu.train.checkpoint_convert import (
        convert_fbocc_checkpoint, load_torch_state_dict)
    sd = load_torch_state_dict(path)
    converted = convert_fbocc_checkpoint(sd)
    return {"params": converted["params"],
            "batch_stats": converted["batch_stats"]}


def save_params_npz(path: str, variables: Dict[str, Any]) -> None:
    flat = _flatten(variables)
    np.savez(path, **{"/".join(k): np.asarray(v) for k, v in flat.items()})


def merge_pretrained(target_vars: Dict[str, Any], src_vars: Dict[str, Any],
                     key_filter: Optional[Iterable[str]] = None,
                     revise_keys: Optional[Iterable] = None,
                     log=print) -> Tuple[Dict[str, Any], Dict[str, int]]:
    """Structurally merge ``src_vars`` into ``target_vars``.

    ``key_filter``: iterable of path prefixes (top-level module names) to
    load, e.g. ``('img_backbone',)`` for the reference's ``load_img_from``.
    ``revise_keys``: (pattern, repl) regex pairs applied to the *source*
    path strings (mmcv's ``revise_keys=[(r'^module\\.', '')]`` analogue).

    Returns (merged_vars, stats) where stats counts loaded / missing /
    shape_mismatch / skipped_by_filter source leaves and target leaves not
    found in the source.
    """
    tflat = _flatten(target_vars)
    sflat = _flatten(src_vars)
    if revise_keys:
        revised = {}
        for path, v in sflat.items():
            s = "/".join(path)
            for pat, repl in revise_keys:
                s = re.sub(pat, repl, s)
            revised[tuple(s.split("/"))] = v
        sflat = revised

    stats = {"loaded": 0, "shape_mismatch": 0, "skipped_by_filter": 0,
             "unused_in_ckpt": 0, "missing_in_ckpt": 0}
    merged: Dict[Tuple[str, ...], Any] = {}
    filt = tuple(key_filter) if key_filter else None
    for path, sv in sflat.items():
        if path not in tflat:
            stats["unused_in_ckpt"] += 1
            continue
        # filter on the module path *below* the collection name
        # ('params', 'img_backbone', ...)
        if filt is not None and not any(p in filt for p in path[:2]):
            stats["skipped_by_filter"] += 1
            continue
        tv = tflat[path]
        if tuple(np.shape(sv)) != tuple(np.shape(tv)):
            stats["shape_mismatch"] += 1
            log(f"[load_pretrained] shape mismatch at {'/'.join(path)}: "
                f"ckpt {np.shape(sv)} vs model {np.shape(tv)}")
            continue
        merged[path] = np.asarray(sv).astype(
            tv.dtype if hasattr(tv, "dtype") else np.float32)
        stats["loaded"] += 1
    stats["missing_in_ckpt"] = len(tflat) - stats["loaded"]
    return _unflatten_into(target_vars, merged), stats


def load_pretrained(state, load_from: Optional[str] = None,
                    load_img_from: Optional[str] = None,
                    revise_keys: Optional[Iterable] = None, log=print):
    """Apply warm-start checkpoint(s) to a TrainState.

    ``load_from`` loads everything it can; ``load_img_from`` loads only the
    image branch (``img_backbone``), matching
    ``/root/reference/tools/train.py:286-299``.  EMA params/stats are
    re-seeded from the merged values.
    """
    params = jax.tree.map(np.asarray, _to_dict(state.params))
    batch_stats = jax.tree.map(np.asarray, _to_dict(state.batch_stats))
    target = {"params": params, "batch_stats": batch_stats}
    for path, key_filter in ((load_from, None),
                             (load_img_from, ("img_backbone",))):
        if not path:
            continue
        src = load_variables(path)
        target, stats = merge_pretrained(
            target, src, key_filter=key_filter, revise_keys=revise_keys,
            log=log)
        log(f"[load_pretrained] {path}: {stats}")
        if stats["loaded"] == 0:
            raise ValueError(
                f"warm start from {path} loaded 0 parameters -- "
                "checkpoint/model mismatch")
    return state.replace(
        params=target["params"],
        batch_stats=target["batch_stats"],
        ema_params=jax.tree.map(np.copy, target["params"]),
        ema_batch_stats=jax.tree.map(np.copy, target["batch_stats"]),
    )


def _to_dict(tree):
    """flax FrozenDict / dict -> plain nested dict."""
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _to_dict(v) for k, v in tree.items()}
    return tree
