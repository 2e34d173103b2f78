"""Post-training int8 quantization (PTQ) for the serving path.

The TPU-native analogue of the reference deployment's reduced-precision
engines (TensorRT FP16/INT8 rows, ``/root/reference/deployment/README.md``):
the v5e MXU runs s8 x s8 -> s32 at 2x the bf16 peak, so the serving convs
are executed as int8 convolutions with

  * per-OUTPUT-CHANNEL symmetric weight scales (host-precomputed),
  * per-INPUT-CHANNEL activation smoothing (SmoothQuant-style): the
    calibration collects per-channel input absmax vectors; a channel
    factor ``t_ci = a_ci**alpha / wmax_ci**(1-alpha)`` is divided out of
    the activation and multiplied into the weight's input-channel axis
    BEFORE weight quantization -- an exact rewrite of the same conv, so
    outlier activation channels (ubiquitous in trained networks; absent
    at random init, which is how the per-tensor scheme initially looked
    fine) stop dictating the whole tensor's scale.  ``alpha`` via
    ``FBBEV_INT8_SMOOTH_ALPHA`` (default 0.5);
    ``FBBEV_INT8_CALIB=tensor`` restores the per-tensor scheme, and
  * a per-TENSOR symmetric scale on the smoothed activation.  The
    per-channel calibration stat is the 99.9th-percentile |x| by default
    (``FBBEV_INT8_ACT_STAT=absmax`` restores the classic max-abs): on
    TRAINED weights a handful of post-relu spikes otherwise dictate the
    whole tensor's step size and argmax agreement collapses to ~60-75%;
    p999 recovers 82-88%, within ~2 points of the bf16 baseline
    (FIDELITY_TRAINED_INT8_R5.json, docs/PERF.md round-5).

Nothing in the model code changes: quantization is applied by a flax
method interceptor (`flax.linen.intercept_methods`) that replaces the
``__call__`` of eligible conv modules -- ``nn.Conv``, ``Conv3DZSlab``,
``Conv1x1x1Dense`` -- with the int8 formulation whenever the module's
path has an entry in the quantization-parameter tree.  The same
interceptor mechanism (with a sow) collects calibration statistics.

Numerically sensitive heads are excluded by default (the final
occupancy logits conv and the pre-softmax depth-bin conv); the
end-to-end cost of the scheme is priced by ``tools/fidelity.py --int8``
the way the reference priced its FP16 engine (mIoU delta column).
"""

from __future__ import annotations

import contextlib
import re
from typing import Any, Callable, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# final 19-class occupancy logits + the 80-way pre-softmax depth head:
# classification logits are the classic PTQ exclusions (and both are
# cheap 1x1 convs, so the MXU win is negligible anyway)
DEFAULT_EXCLUDE = (r"pred_conv2", r"depth_net/depth_conv")
# BEV-side convs (3D encoder + occ head) are excluded BY DEFAULT since
# the round-5 session-6 A/B + trained-weights fidelity: quantizing them
# is a strict LOSS on both axes -- the quant/dequant formatting around
# the small BEV convs costs more than their MXU gain (image-trunk-only
# 32.07 fps vs all-conv 31.37, /tmp/ab_r5f.jsonl) and they carry all of
# int8's trained-weights fidelity cost (83.3-91.6% agreement == the
# bf16 baseline when excluded vs 82-88% all-conv; docs/PARITY.md).
# FBBEV_INT8_BEV=1 re-enables them (the round-4 all-conv config).
BEV_SIDE_EXCLUDE = (r"img_bev_encoder", r"occupancy_head")

_QCOLL = "quant_stats"


def _path_str(module: nn.Module) -> str:
    return "/".join(module.path)


def _eligible(module: nn.Module, method: str) -> bool:
    from fbbev_tpu.models.layers import (Conv1x1x1Dense, Conv3DZFold,
                                         Conv3DZSlab)
    return (method == "__call__"
            and isinstance(module, (nn.Conv, Conv3DZSlab, Conv3DZFold,
                                    Conv1x1x1Dense)))


# ---------------------------------------------------------------------------
# calibration


@contextlib.contextmanager
def collect_scales():
    """Context manager: while active, every eligible conv sows the
    max-abs of its input into the ``quant_stats`` collection.  Run the
    forward with ``mutable=[..., "quant_stats"]`` and read the stats from
    the returned variables."""

    import os
    # DEFAULT p999 since the round-5 trained-weights fidelity runs: the
    # absmax stat collapses trained-weights agreement to ~60-75% (one
    # post-relu spike dictates the whole tensor's step size); the 99.9th
    # percentile recovers 82-88% -- within ~2 points of the bf16
    # baseline (docs/PERF.md round-5, FIDELITY_TRAINED_INT8_R5.json)
    stat = os.environ.get("FBBEV_INT8_ACT_STAT", "p999")

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if _eligible(m, context.method_name) and args:
            x = args[0]
            # per-INPUT-CHANNEL stat (channels-last everywhere): the
            # vector both prices the per-tensor scale (its max) and
            # feeds the smoothing factors in build_qparams.
            # FBBEV_INT8_ACT_STAT=p999 clips the scale at the 99.9th
            # percentile of |x| per channel (the handful of post-relu
            # spikes saturate instead of dictating the step size).
            a = jnp.abs(x.astype(jnp.float32))
            if stat == "p999":
                v = jnp.quantile(a.reshape(-1, a.shape[-1]), 0.999,
                                 axis=0)
            else:
                v = jnp.max(a, axis=tuple(range(x.ndim - 1)))
            m.sow(_QCOLL, "in_absmax", v,
                  init_fn=lambda: jnp.float32(0.0),
                  reduce_fn=jnp.maximum)
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        yield


def scales_from_stats(stats: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Flatten a ``quant_stats`` tree into {module_path: absmax (Cin,)}."""
    flat = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            # leaf: path ends with the sow name ("in_absmax")
            assert path[-1] == "in_absmax", path
            flat["/".join(path[:-1])] = np.asarray(node, np.float64)

    walk(jax.tree.map(np.asarray, stats), ())
    return flat


def _merge_scales(merged: Dict[str, Any], new: Dict[str, Any]) -> None:
    for k, v in new.items():
        merged[k] = np.maximum(merged[k], v) if k in merged else v


def scales_to_json(scales: Dict[str, Any]) -> Dict[str, Any]:
    """Serializable form of a calibration artifact (per-channel vectors
    become lists; legacy scalar entries stay floats)."""
    out = {}
    for k, v in scales.items():
        a = np.asarray(v)
        out[k] = float(a) if a.ndim == 0 else [float(x) for x in a]
    return out


def scales_from_json(obj: Dict[str, Any]) -> Dict[str, Any]:
    return {k: (np.asarray(v, np.float64) if isinstance(v, list)
                else float(v))
            for k, v in obj.items()}


def calibrate_serving(pipe, frames: Sequence[np.ndarray],
                      metas: Sequence[Dict[str, Any]]) -> Dict[str, float]:
    """Run the serving forward over calibration frames collecting
    activation scales.  ``frames[i]``: (B, N, H, W, 3); ``metas[i]``:
    start_of_sequence / sequence_group_idx / curr_to_prev_ego_rt dict."""
    model, variables = pipe.model, pipe.variables
    state = pipe.state

    # rig-static terms must be jit ARGUMENTS: closed-over arrays are
    # embedded in the HLO as literals and the ~270 MB depth-sampling
    # matrix overflows the remote-compile request (HTTP 413).
    @jax.jit
    def step(variables, imgs, meta, state, ranks_bev, bwd_terms,
             mlp_input):
        with collect_scales():
            (pred, new_state), stats = model.apply(
                variables,
                lambda mdl: pipe._fwd(mdl, imgs, meta, state,
                                      ranks_bev, bwd_terms, mlp_input),
                method=_run_bound, mutable=[_QCOLL])
        return new_state, stats[_QCOLL]

    merged: Dict[str, Any] = {}
    for imgs, meta in zip(frames, metas):
        state, stats = step(variables, jnp.asarray(imgs), meta, state,
                            pipe.ranks_bev, pipe.bwd_terms,
                            pipe.mlp_input)
        _merge_scales(merged, scales_from_stats(stats))
    return merged


def _run_bound(mdl, fn):
    return fn(mdl)


def calibrate_model(model, variables, stream, state) -> Dict[str, float]:
    """Collect activation scales over the standard ``model.apply`` eval
    path (one temporal stream of batch dicts).  Used by tools/fidelity.py
    and anywhere a FixedRigPipeline is not in play."""

    @jax.jit
    def step(variables, batch, state):
        with collect_scales():
            (outputs, new_state), mut = model.apply(
                variables, batch, state, train=False, mutable=[_QCOLL])
        return new_state, mut[_QCOLL]

    merged: Dict[str, Any] = {}
    for b in stream:
        state, stats = step(variables, b, state)
        _merge_scales(merged, scales_from_stats(stats))
    return merged


# ---------------------------------------------------------------------------
# qparams construction (host side)


def build_qparams(variables: Dict[str, Any], scales: Dict[str, Any],
                  exclude: Optional[Sequence[str]] = None,
                  min_absmax: float = 1e-6,
                  alpha: Optional[float] = None) -> Dict[str, Dict[str, Any]]:
    """Quantize conv weights per-out-channel for every calibrated path,
    smoothing per-input-channel activation outliers into the weights
    first (module docstring).

    ``scales[path]`` is the calibration absmax: a (Cin,) vector (current
    calibrators) or a legacy scalar (old cache artifacts -- per-tensor).

    Returns a flat {module_path: {"w_q" int8, "s_w" f32[Cout],
    "s_x" f32[], "m_x" f32[Cin] | None, "b" f32[Cout] | None}} dict --
    a valid pytree, passed into the jitted serving step as a device
    input.  ``m_x`` is the fused per-channel quantize multiplier
    ``1 / (t_ci * s_x)``; None means the legacy per-tensor path.
    """
    import os
    if alpha is None:
        alpha = float(os.environ.get("FBBEV_INT8_SMOOTH_ALPHA", "0.5"))
    per_tensor = (os.environ.get("FBBEV_INT8_CALIB", "smooth") == "tensor"
                  or alpha == 0.0)
    if exclude is None:
        # FBBEV_INT8_EXCLUDE_EXTRA: comma-separated regexes appended to
        # the default exclusions (e.g. "depth_net/" keeps the whole
        # depth/context trunk in bf16)
        extra = os.environ.get("FBBEV_INT8_EXCLUDE_EXTRA", "")
        exclude = tuple(DEFAULT_EXCLUDE) + tuple(
            p for p in extra.split(",") if p)
        if os.environ.get("FBBEV_INT8_BEV", "0") != "1":
            # image-trunk-only int8 is the default (see BEV_SIDE_EXCLUDE)
            exclude += tuple(BEV_SIDE_EXCLUDE)
    params = variables["params"]
    exc = [re.compile(p) for p in exclude]
    out: Dict[str, Dict[str, Any]] = {}
    for path, a in scales.items():
        if any(p.search(path) for p in exc):
            continue
        a = np.asarray(a, np.float64)
        absmax = float(a.max())
        if absmax <= min_absmax:
            continue
        node = params
        ok = True
        for k in path.split("/"):
            if not isinstance(node, dict) or k not in node:
                ok = False
                break
            node = node[k]
        if not ok or "kernel" not in node:
            continue
        k = np.asarray(node["kernel"], np.float32)
        m_x = None
        # smoothing needs the full per-input-channel picture: skip for
        # legacy scalar artifacts and for grouped/depthwise kernels
        # (kernel input dim != Cin, so the fold has no 1:1 channel map)
        if (not per_tensor and a.ndim == 1 and k.ndim >= 2
                and k.shape[-2] == a.shape[0]):
            wmax = np.abs(k).max(
                axis=tuple(i for i in range(k.ndim) if i != k.ndim - 2))
            live = (a > min_absmax) & (wmax > 1e-12)
            t = np.ones_like(a)
            t[live] = (a[live] ** alpha) / (wmax[live] ** (1.0 - alpha))
            t = np.clip(t, 1e-5, 1e5)
            k = k * t.astype(np.float32)[..., None]  # input axis is -2
            s_x = float((a / t).max()) / 127.0
            m_x = (1.0 / (t * s_x)).astype(np.float32)
        else:
            s_x = absmax / 127.0
        red = tuple(range(k.ndim - 1))  # all but Cout
        s_w = np.abs(k).max(axis=red) / 127.0
        s_w = np.maximum(s_w, 1e-12)
        w_q = np.clip(np.round(k / s_w), -127, 127).astype(np.int8)
        out[path] = {
            "w_q": jnp.asarray(w_q),
            "s_w": jnp.asarray(s_w.astype(np.float32)),
            "s_x": jnp.float32(s_x),
            "m_x": None if m_x is None else jnp.asarray(m_x),
            "b": (jnp.asarray(np.asarray(node["bias"], np.float32))
                  if "bias" in node else None),
        }
    return out


# ---------------------------------------------------------------------------
# quantized execution


def _quantize_act(x, qp):
    m_x = qp.get("m_x")
    if m_x is not None:
        # fused smooth+quantize: one broadcast multiply on the channel
        # (last) axis -- same HBM cost as the scalar divide
        xq = jnp.round(x.astype(jnp.float32) * m_x)
    else:
        xq = jnp.round(x.astype(jnp.float32) / qp["s_x"])
    return jnp.clip(xq, -127.0, 127.0).astype(jnp.int8)


def _dn(rank: int):
    if rank == 4:
        return ("NHWC", "HWIO", "NHWC")
    if rank == 5:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(rank)


def _canon_padding(pad, nspatial: int):
    if isinstance(pad, str):
        return pad
    if isinstance(pad, int):
        return [(pad, pad)] * nspatial
    out = []
    for p in pad:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


def _out_dtype(m, x):
    return m.dtype if m.dtype is not None else x.dtype


def _assert_nn_conv_supported(m: nn.Conv, x):
    """The int8 formulation replicates only the nn.Conv semantics the
    serving models actually use; anything else must fail loudly instead
    of quantizing with silently different semantics (ADVICE r4)."""
    in_dil = m.input_dilation
    if in_dil is not None and in_dil != 1 and tuple(
            (in_dil,) if isinstance(in_dil, int) else in_dil) != (
            1,) * len(m.kernel_size):
        raise NotImplementedError(
            f"int8 conv {_path_str(m)}: input_dilation={in_dil}")
    if getattr(m, "mask", None) is not None:
        raise NotImplementedError(f"int8 conv {_path_str(m)}: kernel mask")
    if isinstance(m.padding, str) and m.padding.upper() == "CIRCULAR":
        raise NotImplementedError(
            f"int8 conv {_path_str(m)}: CIRCULAR padding")
    if m.dtype is None and x.dtype != jnp.float32:
        # nn.Conv with dtype=None promotes with the f32 params; the int8
        # path returns x.dtype -- a silent dtype change for non-f32 input.
        raise NotImplementedError(
            f"int8 conv {_path_str(m)}: dtype=None promotion "
            f"with x.dtype={x.dtype}")


def code_cache_key(model_size, input_size, seed: int) -> dict:
    """Key for cached activation-scale artifacts: the scales are only
    valid for the exact model config, calibration seed, and quantization
    code that produced them (ADVICE r4: a stale /tmp cache from another
    run must not silently apply wrong per-tensor scales)."""
    import hashlib
    import os as _os
    src_path = _os.path.abspath(__file__)
    if src_path.endswith(".pyc"):
        src_path = src_path[:-1]
    with open(src_path, "rb") as f:
        sha = hashlib.sha256(f.read()).hexdigest()[:16]
    return {"model": str(model_size), "input": list(input_size),
            "seed": int(seed), "quantize_sha": sha,
            "act_stat": _os.environ.get("FBBEV_INT8_ACT_STAT", "p999")}


def _quant_nn_conv(m: nn.Conv, qp, x):
    _assert_nn_conv_supported(m, x)
    n = len(m.kernel_size)
    strides = m.strides or 1
    if isinstance(strides, int):
        strides = (strides,) * n
    dil = m.kernel_dilation or 1
    if isinstance(dil, int):
        dil = (dil,) * n
    xq = _quantize_act(x, qp)
    y = jax.lax.conv_general_dilated(
        xq, qp["w_q"], tuple(strides), _canon_padding(m.padding, n),
        rhs_dilation=tuple(dil), dimension_numbers=_dn(x.ndim),
        feature_group_count=m.feature_group_count,
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (qp["s_x"] * qp["s_w"])
    if qp["b"] is not None:
        y = y + qp["b"]
    return y.astype(_out_dtype(m, x))


def _quant_zslab(m, qp, x):
    # int8 re-derivation of Conv3DZSlab (models/layers.py): quantize the
    # input ONCE, run the three z-shifted 2D convs in int8, accumulate in
    # int32, dequantize once.  Zero-padding is exact under a symmetric
    # scale (q(0) == 0).
    B, Y, X, Z, Cin = x.shape
    s = m.strides
    xq = _quantize_act(x, qp)
    xq = jnp.pad(xq, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    Zo = (Z + 2 - 3) // s + 1
    acc = None
    for dz in range(3):
        xs = jax.lax.slice_in_dim(xq, dz, dz + (Zo - 1) * s + 1, s, axis=3)
        x2 = jnp.moveaxis(xs, 3, 1).reshape(B * Zo, Y, X, Cin)
        y2 = jax.lax.conv_general_dilated(
            x2, qp["w_q"][:, :, dz], (s, s), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y2 = jnp.moveaxis(y2.reshape((B, Zo) + y2.shape[1:]), 1, 3)
        acc = y2 if acc is None else acc + y2
    y = acc.astype(jnp.float32) * (qp["s_x"] * qp["s_w"])
    if qp["b"] is not None:
        y = y + qp["b"]
    return y.astype(_out_dtype(m, x))


def _quant_zfold(m, qp, x):
    # int8 re-derivation of Conv3DZFold (models/layers.py:186): build the
    # z-banded (3, 3, Z*Cin, Zo*Cout) block kernel from the ALREADY
    # int8-quantized weights (off-band entries are exact zeros, so the
    # banding preserves the per-out-channel scales), run ONE int8 2D
    # conv accumulating in int32, dequantize per out-channel after
    # unfolding z back out of the channel dim.
    B, Y, X, Z, Cin = x.shape
    Co = m.features
    s = m.strides
    Zo = (Z + 2 - 3) // s + 1
    zi = jnp.arange(Z)
    zo = jnp.arange(Zo) * s
    dz = zi[None, :] - zo[:, None] + 1          # (Zo, Z)
    mask = (dz >= 0) & (dz < 3)
    Kz = jnp.take(qp["w_q"], jnp.clip(dz, 0, 2), axis=2)  # (3,3,Zo,Z,Ci,Co)
    Kz = Kz * mask[None, None, :, :, None, None].astype(jnp.int8)
    K2 = jnp.transpose(Kz, (0, 1, 3, 4, 2, 5)).reshape(
        3, 3, Z * Cin, Zo * Co)
    xq = _quantize_act(x, qp).reshape(B, Y, X, Z * Cin)
    y2 = jax.lax.conv_general_dilated(
        xq, K2, (s, s), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y2.reshape(B, y2.shape[1], y2.shape[2], Zo, Co)
    y = y.astype(jnp.float32) * (qp["s_x"] * qp["s_w"])
    if qp["b"] is not None:
        y = y + qp["b"]
    return y.astype(_out_dtype(m, x))


def _quant_pointwise(m, qp, x):
    if m.strides != 1:
        s = m.strides
        x = x[:, ::s, ::s, ::s, :]
    Cin = x.shape[-1]
    xq = _quantize_act(x, qp)
    w = qp["w_q"].reshape(Cin, -1)
    y = jax.lax.dot_general(
        xq, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (qp["s_x"] * qp["s_w"])
    if qp["b"] is not None:
        y = y + qp["b"]
    return y.astype(_out_dtype(m, x))


@contextlib.contextmanager
def quantized_calls(qparams: Optional[Dict[str, Dict[str, Any]]]):
    """While active, eligible conv modules whose path is in ``qparams``
    execute the int8 formulation instead of their normal ``__call__``."""
    if not qparams:
        yield
        return

    from fbbev_tpu.models.layers import (Conv1x1x1Dense, Conv3DZFold,
                                         Conv3DZSlab)

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if _eligible(m, context.method_name):
            qp = qparams.get(_path_str(m))
            if qp is not None:
                if isinstance(m, Conv3DZSlab):
                    return _quant_zslab(m, qp, args[0])
                if isinstance(m, Conv3DZFold):
                    return _quant_zfold(m, qp, args[0])
                if isinstance(m, Conv1x1x1Dense):
                    return _quant_pointwise(m, qp, args[0])
                return _quant_nn_conv(m, qp, args[0])
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        yield
