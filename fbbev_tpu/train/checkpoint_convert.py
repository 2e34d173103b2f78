"""Reference-checkpoint converter: FB-OCC torch ``.pth`` -> flax variables.

Maps the reference's parameter names
(``/root/reference/mmdet3d/models/fbbev/...`` module tree) onto this
framework's param/batch_stats pytree, transposing weights into TPU
channels-last layouts:

* Conv2d (O, I, kh, kw)      -> (kh, kw, I, O)
* Conv3d (O, I, kd, kh, kw)  -> (kd, kh, kw, I, O)
* ConvTranspose3d (I, O, k..)-> (kd, kh, kw, I, O)  (flax ConvTranspose)
* Linear (O, I)              -> (I, O)
* BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var

The EMA checkpoints (``epoch_N_ema.pth``) store the same names; pass their
state dict directly.  Loading requires only numpy tensors -- use
``load_torch_state_dict`` to read a ``.pth`` without CUDA.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _deconv3d(w):
    # torch ConvTranspose3d (I, O, kd, kh, kw) -> flax ConvTranspose kernel
    # (kd, kh, kw, I, O) with a spatial flip (lax.conv_transpose does not
    # flip the kernel; torch's deconv semantics require it).
    return np.flip(np.transpose(w, (2, 3, 4, 0, 1)), (0, 1, 2)).copy()


def _linear(w):
    return np.transpose(w, (1, 0))


class _TreeBuilder:
    """Applies the name/transpose mapping rules.

    Forward mode (``reverse=False``): torch state_dict -> flax trees.
    Reverse mode: flax trees -> torch state_dict (checkpoint *export*, so
    models trained here can be inspected with the reference's tooling).
    """

    def __init__(self, sd: Dict[str, np.ndarray], reverse: bool = False,
                 params: Dict[str, Any] = None,
                 batch_stats: Dict[str, Any] = None,
                 partial: bool = False):
        self.sd = sd
        self.reverse = reverse
        # partial forward mode: rules whose source keys are absent are
        # skipped (partial warm starts / per-module parity tests)
        self.partial = partial
        self.params: Dict[str, Any] = params if params is not None else {}
        self.batch_stats: Dict[str, Any] = (
            batch_stats if batch_stats is not None else {})
        self.used = set()

    def _set(self, tree, path, value):
        d = tree
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = np.asarray(value, np.float32)

    def _get(self, tree, path):
        d = tree
        for k in path:
            d = d[k]
        return np.asarray(d)

    def _has(self, tree, path):
        d = tree
        for k in path:
            if not isinstance(d, dict) or k not in d:
                return False
            d = d[k]
        return True

    def take(self, name):
        self.used.add(name)
        return self.sd[name]

    def _pair(self, src, dst, fwd, inv):
        """Map sd[src] <-> tree-leaf dst with transpose fwd (and inverse)."""
        tree = self.params
        if self.reverse:
            self.sd[src] = inv(self._get(tree, dst))
        else:
            if self.partial and src not in self.sd:
                return
            self._set(tree, dst, fwd(self.take(src)))

    def conv(self, src, dst, ndim=2):
        f = {2: _conv2d, 3: _conv3d}[ndim]
        inv = {2: lambda w: np.transpose(w, (3, 2, 0, 1)),
               3: lambda w: np.transpose(w, (4, 3, 0, 1, 2))}[ndim]
        self._pair(src + ".weight", dst + ("kernel",), f, inv)
        has_bias = (self._has(self.params, dst + ("bias",)) if self.reverse
                    else (src + ".bias") in self.sd)
        if has_bias:
            self._pair(src + ".bias", dst + ("bias",), lambda x: x,
                       lambda x: x)

    def deconv3d(self, src, dst):
        self._pair(src + ".weight", dst + ("kernel",), _deconv3d,
                   lambda w: np.transpose(
                       np.flip(w, (0, 1, 2)), (3, 4, 0, 1, 2)).copy())

    def bn(self, src, dst):
        self._pair(src + ".weight", dst + ("scale",), lambda x: x,
                   lambda x: x)
        self._pair(src + ".bias", dst + ("bias",), lambda x: x, lambda x: x)
        if self.reverse:
            self.sd[src + ".running_mean"] = self._get(
                self.batch_stats, dst + ("mean",))
            self.sd[src + ".running_var"] = self._get(
                self.batch_stats, dst + ("var",))
        else:
            if self.partial and (src + ".running_mean") not in self.sd:
                return
            self._set(self.batch_stats, dst + ("mean",),
                      self.take(src + ".running_mean"))
            self._set(self.batch_stats, dst + ("var",),
                      self.take(src + ".running_var"))

    def linear(self, src, dst):
        self._pair(src + ".weight", dst + ("kernel",), _linear, _linear)
        has_bias = (self._has(self.params, dst + ("bias",)) if self.reverse
                    else (src + ".bias") in self.sd)
        if has_bias:
            self._pair(src + ".bias", dst + ("bias",), lambda x: x,
                       lambda x: x)

    def dense_from_1x1conv(self, src, dst):
        self._pair(src + ".weight", dst + ("kernel",),
                   lambda w: _linear(w[:, :, 0, 0]),
                   lambda w: _linear(w)[:, :, None, None])
        self._pair(src + ".bias", dst + ("bias",), lambda x: x, lambda x: x)

    def layernorm(self, src, dst):
        self._pair(src + ".weight", dst + ("scale",), lambda x: x,
                   lambda x: x)
        self._pair(src + ".bias", dst + ("bias",), lambda x: x, lambda x: x)

    def embed(self, src, dst):
        self._pair(src + ".weight", dst + ("embedding",), lambda x: x,
                   lambda x: x)

    def raw(self, src, dst):
        self._pair(src, dst, lambda x: x, lambda x: x)

    def has_src(self, name):
        if self.reverse:
            return True
        return name in self.sd

    def convbn(self, src_conv, src_bn, dst, ndim=2):
        self.conv(src_conv, dst + ("conv",), ndim)
        self.bn(src_bn, dst + ("bn",))


def _has_block(b: _TreeBuilder, src_name: str, dst_path):
    if b.reverse:
        return b._has(b.params, dst_path)
    return src_name in b.sd


def _convert_resnet50(b: _TreeBuilder, src: str, dst: str):
    blocks = (3, 4, 6, 3)
    b.convbn(f"{src}.conv1", f"{src}.bn1", (dst, "stem"))
    for stage, n in enumerate(blocks):
        for i in range(n):
            p = f"{src}.layer{stage + 1}.{i}"
            d = (dst, f"layer{stage + 1}_{i}")
            for c in (1, 2, 3):
                b.convbn(f"{p}.conv{c}", f"{p}.bn{c}", d + (f"conv{c}",))
            if _has_block(b, f"{p}.downsample.0.weight",
                          d + ("downsample", "conv", "kernel")):
                b.convbn(f"{p}.downsample.0", f"{p}.downsample.1",
                         d + ("downsample",))


def _convert_basicblock2d(b: _TreeBuilder, src: str, dst: Tuple[str, ...]):
    b.convbn(f"{src}.conv1", f"{src}.bn1", dst + ("conv1",))
    b.convbn(f"{src}.conv2", f"{src}.bn2", dst + ("conv2",))
    if _has_block(b, f"{src}.downsample.0.weight",
                  dst + ("downsample", "conv", "kernel")):
        b.convbn(f"{src}.downsample.0", f"{src}.downsample.1",
                 dst + ("downsample",))


def convert_fbocc_checkpoint(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Full flagship FB-OCC R50 conversion -> {'params', 'batch_stats'}."""
    b = _TreeBuilder(sd)
    _apply_fbocc_rules(b)
    unused = [k for k in sd if k not in b.used
              and not k.endswith("num_batches_tracked")]
    return {"params": b.params, "batch_stats": b.batch_stats,
            "unused_keys": unused}


def export_fbocc_checkpoint(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse direction: this framework's variables -> a reference-style
    torch state dict (numpy tensors)."""
    import jax
    params = jax.tree.map(np.asarray, dict(variables["params"]))
    batch_stats = jax.tree.map(np.asarray, dict(variables["batch_stats"]))
    b = _TreeBuilder({}, reverse=True, params=params,
                     batch_stats=batch_stats)
    _apply_fbocc_rules(b)
    return b.sd


def _apply_fbocc_rules(b: _TreeBuilder) -> None:

    _convert_resnet50(b, "img_backbone", "img_backbone")

    # CustomFPN: lateral convs 0/1 + fpn conv 0
    for i in range(2):
        b.conv(f"img_neck.lateral_convs.{i}.conv",
               ("img_neck", f"lateral{i}"))
    b.conv("img_neck.fpn_convs.0.conv", ("img_neck", "fpn0"))

    # depth net
    dn = "depth_net"
    b.convbn(f"{dn}.reduce_conv.0", f"{dn}.reduce_conv.1",
             ("depth_net", "reduce_conv"))
    b.bn(f"{dn}.bn", ("depth_net", "param_bn"))
    for branch in ("context", "depth"):
        b.linear(f"{dn}.{branch}_mlp.fc1",
                 ("depth_net", f"{branch}_mlp", "fc1"))
        b.linear(f"{dn}.{branch}_mlp.fc2",
                 ("depth_net", f"{branch}_mlp", "fc2"))
        # SELayer 1x1 convs -> Dense: (O, I, 1, 1) -> (I, O)
        for tconv, fdense in (("conv_reduce", "reduce"),
                              ("conv_expand", "expand")):
            b.dense_from_1x1conv(
                f"{dn}.{branch}_se.{tconv}",
                ("depth_net", f"{branch}_se", fdense))
    b.conv(f"{dn}.context_conv", ("depth_net", "context_conv"))
    for i in range(3):
        _convert_basicblock2d(b, f"{dn}.depth_conv.{i}",
                              ("depth_net", f"depth_block{i}"))
    aspp = f"{dn}.depth_conv.3"
    for i in range(4):
        b.convbn(f"{aspp}.aspp{i + 1}.atrous_conv", f"{aspp}.aspp{i + 1}.bn",
                 ("depth_net", "aspp", f"aspp{i + 1}"))
    b.convbn(f"{aspp}.global_avg_pool.1", f"{aspp}.global_avg_pool.2",
             ("depth_net", "aspp", "gap"))
    b.convbn(f"{aspp}.conv1", f"{aspp}.bn1", ("depth_net", "aspp", "proj"))
    b.conv(f"{dn}.depth_conv.4", ("depth_net", "depth_conv"))

    # backward projection
    bp = "backward_projection"
    b.raw(f"{bp}.bev_embedding.weight",
          ("backward_projection", "bev_embedding"))
    b.embed(f"{bp}.positional_encoding.row_embed",
            ("backward_projection", "positional_encoding", "row_embed"))
    b.embed(f"{bp}.positional_encoding.col_embed",
            ("backward_projection", "positional_encoding", "col_embed"))
    layer = f"{bp}.transformer.encoder.layers.0"
    sa = ("backward_projection", "layer0", "self_attn")
    for nm in ("sampling_offsets", "attention_weights", "value_proj",
               "output_proj"):
        b.linear(f"{layer}.attentions.0.{nm}", sa + (nm,))
    ca = ("backward_projection", "layer0", "cross_attn")
    da = ca + ("deformable_attention",)
    for nm in ("sampling_offsets", "attention_weights", "value_proj"):
        b.linear(f"{layer}.attentions.1.deformable_attention.{nm}", da + (nm,))
    b.linear(f"{layer}.attentions.1.output_proj", ca + ("output_proj",))
    b.linear(f"{layer}.ffns.0.layers.0.0",
             ("backward_projection", "layer0", "ffn", "fc1"))
    b.linear(f"{layer}.ffns.0.layers.1",
             ("backward_projection", "layer0", "ffn", "fc2"))
    for i in range(3):
        b.layernorm(f"{layer}.norms.{i}",
                    ("backward_projection", "layer0", f"norm{i + 1}"))

    # temporal fusion convs (Conv3d 1x1x1)
    b.conv("history_keyframe_time_conv.0",
           ("history_time_conv", "conv"), ndim=3)
    b.bn("history_keyframe_time_conv.1", ("history_time_conv", "bn"))
    b.conv("history_keyframe_cat_conv.0",
           ("history_cat_conv", "conv"), ndim=3)
    b.bn("history_keyframe_cat_conv.1", ("history_cat_conv", "bn"))

    # 3D BEV encoder
    be = "img_bev_encoder_backbone"
    b.conv(f"{be}.input_proj.0", ("img_bev_encoder_backbone", "input_proj",
                                  "conv"), ndim=3)
    b.bn(f"{be}.input_proj.1", ("img_bev_encoder_backbone", "input_proj",
                                "bn"))
    for stage in range(3):
        for i in range(2):
            p = f"{be}.layers.{stage}.{i}"
            d = ("img_bev_encoder_backbone", f"layer{stage}_{i}")
            b.conv(f"{p}.conv1", d + ("conv1", "conv"), ndim=3)
            b.bn(f"{p}.bn1", d + ("conv1", "bn"))
            b.conv(f"{p}.conv2", d + ("conv2", "conv"), ndim=3)
            b.bn(f"{p}.bn2", d + ("conv2", "bn"))
            if _has_block(b, f"{p}.downsample.0.weight",
                          d + ("downsample", "conv", "kernel")):
                b.conv(f"{p}.downsample.0", d + ("downsample", "conv"),
                       ndim=3)
                b.bn(f"{p}.downsample.1", d + ("downsample", "bn"))

    bn3 = "img_bev_encoder_neck"
    for i in range(3):
        b.conv(f"{bn3}.lateral_convs.{i}.0.conv",
               ("img_bev_encoder_neck", f"lateral{i}", "conv"), ndim=3)
        b.bn(f"{bn3}.lateral_convs.{i}.0.bn",
             ("img_bev_encoder_neck", f"lateral{i}", "bn"))
        b.conv(f"{bn3}.fpn_convs.{i}.0.conv",
               ("img_bev_encoder_neck", f"fpn{i}", "conv"), ndim=3)
        b.bn(f"{bn3}.fpn_convs.{i}.0.bn",
             ("img_bev_encoder_neck", f"fpn{i}", "bn"))

    # occupancy head
    oh = "occupancy_head"
    b.deconv3d(f"{oh}.deblock.0", ("occupancy_head", "deblock_conv"))
    b.bn(f"{oh}.deblock.1", ("occupancy_head", "deblock_bn"))
    for i in range(3):
        b.conv(f"{oh}.occ_convs.{i}.0", ("occupancy_head", f"occ_conv{i}",
                                         "conv"), ndim=3)
        b.bn(f"{oh}.occ_convs.{i}.1", ("occupancy_head", f"occ_conv{i}",
                                       "bn"))
    b.conv(f"{oh}.voxel_soft_weights.0",
           ("occupancy_head", "soft_weight_conv1", "conv"), ndim=3)
    b.bn(f"{oh}.voxel_soft_weights.1",
         ("occupancy_head", "soft_weight_conv1", "bn"))
    b.conv(f"{oh}.voxel_soft_weights.3",
           ("occupancy_head", "soft_weight_conv2"), ndim=3)
    b.conv(f"{oh}.occ_pred_conv.0", ("occupancy_head", "pred_conv1", "conv"),
           ndim=3)
    b.bn(f"{oh}.occ_pred_conv.1", ("occupancy_head", "pred_conv1", "bn"))
    b.conv(f"{oh}.occ_pred_conv.3", ("occupancy_head", "pred_conv2"), ndim=3)


def convert_vovnet_backbone(b: _TreeBuilder, src: str = "img_backbone",
                            dst: str = "img_backbone",
                            spec_name: str = "V-99-eSE") -> None:
    """VoVNetCP backbone rules.

    Reference naming (``/root/reference/mmdet3d/models/backbones/vovnet.py``
    conv3x3/conv1x1 Sequential keys): ``stem.stem_{i}/conv.weight``,
    ``stage{n}.OSA{n}_{blk}.layers.{i}.OSA{n}_{blk}_{i}/conv.weight``,
    ``...concat.OSA{n}_{blk}_concat/conv.weight``, ``...ese.fc.weight``.
    """
    from fbbev_tpu.models.vovnet import STAGE_SPECS
    spec = STAGE_SPECS[spec_name]
    for i in (1, 2, 3):
        b.convbn(f"{src}.stem.stem_{i}/conv", f"{src}.stem.stem_{i}/norm",
                 (dst, f"stem{i}"))
    for stage in range(4):
        n = stage + 2
        for blk in range(spec["block_per_stage"][stage]):
            p = f"{src}.stage{n}.OSA{n}_{blk + 1}"
            d = (dst, f"stage{n}_{blk}")
            for i in range(spec["layer_per_block"]):
                b.convbn(f"{p}.layers.{i}.OSA{n}_{blk + 1}_{i}/conv",
                         f"{p}.layers.{i}.OSA{n}_{blk + 1}_{i}/norm",
                         d + (f"conv{i}",))
            b.convbn(f"{p}.concat.OSA{n}_{blk + 1}_concat/conv",
                     f"{p}.concat.OSA{n}_{blk + 1}_concat/norm",
                     d + ("concat",))
            b.conv(f"{p}.ese.fc", d + ("ese", "fc"))


def convert_convnext_backbone(b: _TreeBuilder, src: str = "img_backbone",
                              dst: str = "img_backbone",
                              arch: str = "base",
                              out_indices=(2, 3)) -> None:
    """ConvNeXt backbone rules.

    Reference naming (``/root/reference/mmdet3d/models/backbones/convnext.py:285-336``):
    ``downsample_layers.0.{0,1}`` = stem conv + LN,
    ``downsample_layers.{i}.{0,1}`` = LN + 2x2 conv (i >= 1),
    ``stages.{i}.{j}.{depthwise_conv,norm,pointwise_conv1,pointwise_conv2,
    gamma}`` (pointwise convs are nn.Linear), ``norm{i}`` = out-stage LN.
    """
    from fbbev_tpu.models.convnext import SPECS
    spec = SPECS[arch]
    b.conv(f"{src}.downsample_layers.0.0", (dst, "stem_conv"))
    b.layernorm(f"{src}.downsample_layers.0.1", (dst, "stem_norm"))
    for i in range(1, len(spec["depths"])):
        b.layernorm(f"{src}.downsample_layers.{i}.0",
                    (dst, f"down{i}_norm"))
        b.conv(f"{src}.downsample_layers.{i}.1", (dst, f"down{i}_conv"))
    for i, depth in enumerate(spec["depths"]):
        for j in range(depth):
            p = f"{src}.stages.{i}.{j}"
            d = (dst, f"stage{i}_{j}")
            b.conv(f"{p}.depthwise_conv", d + ("dwconv",))
            b.layernorm(f"{p}.norm", d + ("norm",))
            b.linear(f"{p}.pointwise_conv1", d + ("pwconv1",))
            b.linear(f"{p}.pointwise_conv2", d + ("pwconv2",))
            b.raw(f"{p}.gamma", d + ("gamma",))
        if i in out_indices:
            b.layernorm(f"{src}.norm{i}", (dst, f"out_norm{i}"))


def convert_convnext_checkpoint(sd: Dict[str, np.ndarray],
                                arch: str = "base",
                                out_indices=(2, 3)) -> Dict[str, Any]:
    b = _TreeBuilder(sd)
    convert_convnext_backbone(b, arch=arch, out_indices=out_indices)
    unused = [k for k in sd if k not in b.used
              and not k.endswith("num_batches_tracked")]
    return {"params": b.params, "batch_stats": b.batch_stats,
            "unused_keys": unused}


def export_convnext_checkpoint(variables: Dict[str, Any],
                               arch: str = "base",
                               out_indices=(2, 3)) -> Dict[str, np.ndarray]:
    import jax
    b = _TreeBuilder({}, reverse=True,
                     params=jax.tree.map(np.asarray,
                                         dict(variables["params"])),
                     batch_stats=jax.tree.map(
                         np.asarray, dict(variables.get("batch_stats", {}))))
    convert_convnext_backbone(b, arch=arch, out_indices=out_indices)
    return b.sd


def convert_swin_backbone(b: _TreeBuilder, src: str = "img_backbone",
                          dst: str = "img_backbone", arch: str = "base",
                          out_indices=(2, 3)) -> None:
    """SwinTransformer backbone rules.

    Reference naming (``/root/reference/mmdet3d/models/backbones/swin.py``
    mmcv convention): ``patch_embed.projection/norm``,
    ``stages.{i}.blocks.{j}.{norm1,attn.w_msa.{relative_position_bias_table,
    qkv,proj},norm2,ffn.layers.0.0,ffn.layers.1}``,
    ``stages.{i}.downsample.{norm,reduction}``, out ``norm{i}``.

    Patch merging: the reference's PatchMerging flattens the 2x2
    neighbourhood with ``nn.Unfold`` -- channel order ``c*4 + dy*2 + dx``
    (the reference itself reorders official-Swin weights into this order,
    ``swin.py:28-58``); our merge concat is ``(dy, dx, c)``-ordered, so the
    reduction weight's input dim and the pre-reduction norm are permuted.
    """
    from fbbev_tpu.models.swin import SPECS
    spec = SPECS[arch]
    b.conv(f"{src}.patch_embed.projection", (dst, "patch_embed"))
    b.layernorm(f"{src}.patch_embed.norm", (dst, "patch_norm"))
    depths = spec["depths"]
    for i, depth in enumerate(depths):
        for j in range(depth):
            p = f"{src}.stages.{i}.blocks.{j}"
            d = (dst, f"stage{i}_{j}")
            b.layernorm(f"{p}.norm1", d + ("norm1",))
            b.raw(f"{p}.attn.w_msa.relative_position_bias_table",
                  d + ("attn", "rel_pos_bias"))
            b.linear(f"{p}.attn.w_msa.qkv", d + ("attn", "qkv"))
            b.linear(f"{p}.attn.w_msa.proj", d + ("attn", "proj"))
            b.layernorm(f"{p}.norm2", d + ("norm2",))
            b.linear(f"{p}.ffn.layers.0.0", d + ("mlp_fc1",))
            b.linear(f"{p}.ffn.layers.1", d + ("mlp_fc2",))
        if i < len(depths) - 1:
            C = spec["embed"] * 2 ** i
            # perm[o] = reference (unfold) column for our channel o=(dy,dx,c)
            o = np.arange(4 * C)
            dy, dx, c = o // (2 * C), (o // C) % 2, o % C
            perm = c * 4 + dy * 2 + dx
            inv_perm = np.argsort(perm)
            ds = f"{src}.stages.{i}.downsample"
            dm = (dst, f"merge{i + 1}_norm")
            b._pair(f"{ds}.norm.weight", dm + ("scale",),
                    lambda w, p=perm: w[p], lambda w, ip=inv_perm: w[ip])
            b._pair(f"{ds}.norm.bias", dm + ("bias",),
                    lambda w, p=perm: w[p], lambda w, ip=inv_perm: w[ip])
            b._pair(f"{ds}.reduction.weight",
                    (dst, f"merge{i + 1}_reduce", "kernel"),
                    lambda w, p=perm: _linear(w)[p],
                    lambda w, ip=inv_perm: _linear(w[ip]))
        if i in out_indices:
            b.layernorm(f"{src}.norm{i}", (dst, f"out_norm{i}"))


def convert_swin_checkpoint(sd: Dict[str, np.ndarray], arch: str = "base",
                            out_indices=(2, 3)) -> Dict[str, Any]:
    b = _TreeBuilder(sd)
    convert_swin_backbone(b, arch=arch, out_indices=out_indices)
    unused = [k for k in sd if k not in b.used
              and not k.endswith(("num_batches_tracked",
                                  "relative_position_index"))]
    return {"params": b.params, "batch_stats": b.batch_stats,
            "unused_keys": unused}


def export_swin_checkpoint(variables: Dict[str, Any], arch: str = "base",
                           out_indices=(2, 3)) -> Dict[str, np.ndarray]:
    import jax
    b = _TreeBuilder({}, reverse=True,
                     params=jax.tree.map(np.asarray,
                                         dict(variables["params"])),
                     batch_stats=jax.tree.map(
                         np.asarray, dict(variables.get("batch_stats", {}))))
    convert_swin_backbone(b, arch=arch, out_indices=out_indices)
    return b.sd


def _convert_dla_tree(b: _TreeBuilder, src: str, dst: Tuple[str, ...],
                      levels: int, in_ch: int, out_ch: int) -> None:
    if in_ch != out_ch:
        b.conv(f"{src}.project.0", dst + ("project", "conv"))
        b.bn(f"{src}.project.1", dst + ("project", "bn"))
    if levels == 1:
        for t in ("tree1", "tree2"):
            b.conv(f"{src}.{t}.conv1", dst + (t, "conv1", "conv"))
            b.bn(f"{src}.{t}.norm1", dst + (t, "conv1", "bn"))
            b.conv(f"{src}.{t}.conv2", dst + (t, "conv2", "conv"))
            b.bn(f"{src}.{t}.norm2", dst + (t, "conv2", "bn"))
        b.convbn(f"{src}.root.conv", f"{src}.root.norm",
                 dst + ("root", "conv"))
    else:
        _convert_dla_tree(b, f"{src}.tree1", dst + ("tree1",),
                          levels - 1, in_ch, out_ch)
        _convert_dla_tree(b, f"{src}.tree2", dst + ("tree2",),
                          levels - 1, out_ch, out_ch)


def convert_dla_backbone(b: _TreeBuilder, src: str = "img_backbone",
                         dst: str = "img_backbone",
                         arch: str = "dla34") -> None:
    """DLANet backbone rules (reference naming,
    ``/root/reference/mmdet3d/models/backbones/dla.py:340-430``):
    ``base_layer.{0,1}``, ``level{0,1}.{0,1}`` conv levels, then recursive
    ``level{2..5}.(project.{0,1}|tree1|tree2|root.{conv,norm})`` trees."""
    from fbbev_tpu.models.dla import SPECS
    spec = SPECS[arch]
    ch = spec["channels"]
    b.convbn(f"{src}.base_layer.0", f"{src}.base_layer.1",
             (dst, "base_layer"))
    b.convbn(f"{src}.level0.0", f"{src}.level0.1", (dst, "level0"))
    b.convbn(f"{src}.level1.0", f"{src}.level1.1", (dst, "level1"))
    for lvl in range(2, 6):
        _convert_dla_tree(b, f"{src}.level{lvl}", (dst, f"level{lvl}"),
                          spec["levels"][lvl], ch[lvl - 1], ch[lvl])


def convert_dla_checkpoint(sd: Dict[str, np.ndarray],
                           arch: str = "dla34") -> Dict[str, Any]:
    b = _TreeBuilder(sd)
    convert_dla_backbone(b, arch=arch)
    unused = [k for k in sd if k not in b.used
              and not k.endswith("num_batches_tracked")]
    return {"params": b.params, "batch_stats": b.batch_stats,
            "unused_keys": unused}


def export_dla_checkpoint(variables: Dict[str, Any],
                          arch: str = "dla34") -> Dict[str, np.ndarray]:
    import jax
    b = _TreeBuilder({}, reverse=True,
                     params=jax.tree.map(np.asarray,
                                         dict(variables["params"])),
                     batch_stats=jax.tree.map(
                         np.asarray, dict(variables.get("batch_stats", {}))))
    convert_dla_backbone(b, arch=arch)
    return b.sd


def convert_vovnet_checkpoint(sd: Dict[str, np.ndarray],
                              spec_name: str = "V-99-eSE") -> Dict[str, Any]:
    """Standalone VoVNet backbone conversion (e.g. a depth-pretrain
    checkpoint for ``fbocc-vov99`` warm starts)."""
    b = _TreeBuilder(sd)
    convert_vovnet_backbone(b, spec_name=spec_name)
    unused = [k for k in sd if k not in b.used
              and not k.endswith("num_batches_tracked")]
    return {"params": b.params, "batch_stats": b.batch_stats,
            "unused_keys": unused}


def export_vovnet_checkpoint(variables: Dict[str, Any],
                             spec_name: str = "V-99-eSE"
                             ) -> Dict[str, np.ndarray]:
    import jax
    b = _TreeBuilder({}, reverse=True,
                     params=jax.tree.map(np.asarray,
                                         dict(variables["params"])),
                     batch_stats=jax.tree.map(np.asarray,
                                              dict(variables["batch_stats"])))
    convert_vovnet_backbone(b, spec_name=spec_name)
    return b.sd
