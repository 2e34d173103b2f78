"""Reference-style nested model-config builder.

BASELINE.json requires preserving the reference's config-driven model-zoo
API: ``model = dict(type='FBOCC', img_backbone=dict(type='ResNet', ...),
depth_net=dict(...), ...)`` (cf. ``occupancy_configs/fb_occ/
fbocc-r50-cbgs_depth_16f_16x4_20e.py:111-250``).  This module translates
that nested component schema into :class:`fbbev_tpu.models.fbocc.FBOCC`
constructor kwargs, so reference-shaped configs drop in directly.

Flat configs (plain FBOCC kwargs) remain supported; ``build_detector``
dispatches on the presence of nested component dicts.
"""

from __future__ import annotations

from typing import Any, Dict

_BACKBONE_TYPES = {
    "ResNet": "ResNet",
    "VoVNetCP": "VoVNetCP",
    "ConvNeXt": "ConvNeXt",
    "SwinTransformer": "SwinTransformer",
    "DLANet": "DLANet",
}


def translate_reference_model_cfg(model: Dict[str, Any]) -> Dict[str, Any]:
    """Nested reference-style model dict -> FBOCC kwargs."""
    m = dict(model)
    m.pop("type", None)
    kwargs: Dict[str, Any] = {}

    bb = m.pop("img_backbone", None)
    if bb:
        btype = bb.get("type", "ResNet")
        kwargs["backbone_type"] = _BACKBONE_TYPES[btype]
        if btype == "ResNet":
            kwargs["backbone_depth"] = bb.get("depth", 50)
        elif "spec_name" in bb:
            kwargs["backbone_arch"] = bb["spec_name"]
        elif "arch" in bb:
            kwargs["backbone_arch"] = bb["arch"]
        if bb.get("with_cp"):
            kwargs["remat"] = True

    neck = m.pop("img_neck", None)
    if neck:
        kwargs["img_feat_channels"] = neck.get("out_channels", 256)

    dn = m.pop("depth_net", None)
    if dn:
        kwargs["single_bev_num_channels"] = dn.get("context_channels", 80)
        kwargs["depth_channels"] = dn.get("depth_channels", 80)
        if dn.get("grid_config"):
            kwargs["grid_config"] = {
                k: tuple(v) for k, v in dn["grid_config"].items()}

    fp = m.pop("forward_projection", None)
    if fp:
        if fp.get("grid_config"):
            kwargs["grid_config"] = {
                k: tuple(v) for k, v in fp["grid_config"].items()}
        if fp.get("input_size"):
            kwargs["input_size"] = tuple(fp["input_size"])
        kwargs["downsample"] = fp.get("downsample", 16)

    bp = m.pop("backward_projection", None)
    kwargs["use_backward_projection"] = bp is not None
    if bp:
        if bp.get("pc_range"):
            kwargs["pc_range"] = tuple(bp["pc_range"])
        tf = bp.get("transformer", {})
        enc = tf.get("encoder", {})
        if enc.get("grid_config"):
            kwargs["bevformer_grid_config"] = {
                k: tuple(v) for k, v in enc["grid_config"].items()}

    bev_bb = m.pop("img_bev_encoder_backbone", None)
    if bev_bb:
        kwargs["voxel_channels"] = tuple(
            bev_bb.get("block_inplanes", (64, 128, 256)))
    bev_neck = m.pop("img_bev_encoder_neck", None)
    if bev_neck:
        kwargs["voxel_out_channels"] = bev_neck.get("out_channels", 256)

    occ = m.pop("occupancy_head", None)
    kwargs["use_occupancy_head"] = occ is not None
    if occ:
        kwargs["num_classes"] = occ.get("out_channel", 19)

    pts = m.pop("pts_bbox_head", None)
    kwargs["use_detection_head"] = pts is not None

    m.pop("frpn", None)  # FRPN is config-disabled in all shipped models

    # passthrough scalar options shared with the flat schema
    for key in ("use_depth_supervision", "do_history", "history_cat_num",
                "history_cat_conv_out_channels", "readd",
                "single_bev_num_channels", "fix_void", "dtype",
                "max_queries_per_cam", "num_cams"):
        if key in m:
            val = m.pop(key)
            if key in ("do_history", "fix_void"):
                continue  # runtime/loss concerns, not constructor kwargs
            kwargs[key] = val
    return kwargs


_DTYPES = {"float32": "float32", "bfloat16": "bfloat16"}


def build_detector(model_cfg: Dict[str, Any]):
    """Build an FBOCC from either schema (flat kwargs or reference-nested)."""
    import jax.numpy as jnp

    from fbbev_tpu.models.fbocc import FBOCC

    dtypes = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}

    cfg = dict(model_cfg)
    cfg.pop("type", None)
    nested = any(isinstance(v, dict) and "type" in v
                 for v in cfg.values())
    kwargs = translate_reference_model_cfg(cfg) if nested else cfg
    if isinstance(kwargs.get("dtype"), str):
        kwargs["dtype"] = dtypes[kwargs["dtype"]]
    for key in ("input_size", "voxel_channels", "pc_range"):
        if key in kwargs and kwargs[key] is not None:
            kwargs[key] = tuple(kwargs[key])
    for key in ("grid_config", "bevformer_grid_config"):
        if key in kwargs and kwargs[key] is not None:
            kwargs[key] = {k: tuple(v) for k, v in kwargs[key].items()}
    return FBOCC(**kwargs)
