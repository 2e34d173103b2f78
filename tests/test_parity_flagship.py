"""Checkpoint-parity harness: converted torch weights must produce the
same activations module-by-module (VERDICT r1 item 5).

Until the released ``fbocc-r50-cbgs_depth_16f_16x4_20e.pth`` is available
in this environment, these tests stand in for the BASELINE.md fidelity
check: they run REAL torch modules (torchvision ResNet-50; hand-built
torch equivalents of the reference's fusion convs per
``detectors/fbocc.py:110-127,303-310``) with randomly initialised weights,
push those weights through :mod:`train.checkpoint_convert`, and assert the
flax side reproduces the torch activations.  Any converter naming/layout
bug or model-semantics drift fails here before a real checkpoint exists.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fbbev_tpu.train.checkpoint_convert import (_apply_fbocc_rules,
                                                _TreeBuilder)


def _convert_subset(sd):
    """Run the full flagship rule set over a partial state dict."""
    b = _TreeBuilder({k: np.asarray(v) for k, v in sd.items()},
                     partial=True)
    _apply_fbocc_rules(b)
    unused = [k for k in sd if k not in b.used
              and not k.endswith("num_batches_tracked")]
    assert not unused, unused
    return {"params": b.params, "batch_stats": b.batch_stats}


class _TorchBottleneck(torch.nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        cout = planes * 4
        self.conv1 = torch.nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride, 1,
                                     bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(cout)
        self.relu = torch.nn.ReLU()
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idn)


class _TorchResNet50(torch.nn.Module):
    """torchvision-naming ResNet-50 ('pytorch' style: stride on conv2),
    matching the reference's mmdet ResNet (config :119-129)."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU()
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        cin = 64
        for li, (planes, n, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]):
            blocks = []
            for b in range(n):
                blocks.append(_TorchBottleneck(
                    cin, planes, stride if b == 0 else 1))
                cin = planes * 4
            setattr(self, f"layer{li + 1}", torch.nn.Sequential(*blocks))


def test_resnet50_activations_match_torch(rng):
    """torch R50 weights -> converter -> our ResNet must give identical
    C4/C5 features (the reference's img_backbone is torchvision-pretrained
    mmdet ResNet, config :119-129)."""
    from fbbev_tpu.models.resnet import ResNet

    tm = _TorchResNet50()
    tm.eval()
    # randomise BN stats too, so running-stat mapping is exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(
                    torch.rand_like(m.running_var) * 0.5 + 0.5)

    sd = {f"img_backbone.{k}": v.detach().numpy()
          for k, v in tm.state_dict().items()}
    variables = _convert_subset(sd)

    x = rng.randn(1, 3, 64, 176).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x)
        t = tm.maxpool(tm.relu(tm.bn1(tm.conv1(t))))
        t = tm.layer1(t)
        t = tm.layer2(t)
        c4 = tm.layer3(t)
        c5 = tm.layer4(c4)

    model = ResNet(depth=50, out_indices=(2, 3))
    params = variables["params"]["img_backbone"]
    stats = variables["batch_stats"]["img_backbone"]
    outs = model.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                       False)
    got_c4 = np.transpose(np.asarray(outs[0]), (0, 3, 1, 2))
    got_c5 = np.transpose(np.asarray(outs[1]), (0, 3, 1, 2))
    np.testing.assert_allclose(got_c4, c4.numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(got_c5, c5.numpy(), atol=2e-3, rtol=1e-3)


def test_fuse_history_matches_torch_oracle(rng):
    """fuse_history (warp + time/cat convs) vs a torch re-execution of the
    reference pipeline (``fbocc.py:207-319``): F.grid_sample 5-D
    align_corners=True + Conv3d(1x1x1)+BN+ReLU convs, weights shared via
    the checkpoint converter."""
    import torch.nn.functional as F

    from fbbev_tpu.models.fbocc import FBOCC, TemporalState

    T, C = 2, 8
    B, ny, nx, nz = 1, 20, 20, 4
    model = FBOCC(
        grid_config=dict(x=(-40.0, 40.0, 4.0), y=(-40.0, 40.0, 4.0),
                         z=(-1.0, 5.4, 1.6), depth=(2.0, 42.0, 0.5)),
        bevformer_grid_config=dict(x=(-40.0, 40.0, 4.0),
                                   y=(-40.0, 40.0, 4.0), z=(-1.0, 5.4, 3.2)),
        input_size=(64, 176), num_cams=2, history_cat_num=T,
        single_bev_num_channels=C, history_cat_conv_out_channels=2 * C,
        voxel_channels=(16, 32, 64), voxel_out_channels=32)

    # torch side: the two fusion convs (Conv3d 1x1x1 + BN3d + ReLU)
    tc_time = torch.nn.Sequential(
        torch.nn.Conv3d(C + 1, C, 1), torch.nn.BatchNorm3d(C),
        torch.nn.ReLU())
    tc_cat = torch.nn.Sequential(
        torch.nn.Conv3d((T + 1) * C, 2 * C, 1),
        torch.nn.BatchNorm3d(2 * C), torch.nn.ReLU())
    tc_time.eval()
    tc_cat.eval()
    with torch.no_grad():
        for seq in (tc_time, tc_cat):
            bn = seq[1]
            bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.1)
            bn.running_var.copy_(torch.rand_like(bn.running_var) * 0.5 + 0.5)

    sd = {}
    for name, seq in (("history_keyframe_time_conv", tc_time),
                      ("history_keyframe_cat_conv", tc_cat)):
        for k, v in seq.state_dict().items():
            sd[f"{name}.{k}"] = v.detach().numpy()
    variables = _convert_subset(sd)
    params = {"history_time_conv": variables["params"]["history_time_conv"],
              "history_cat_conv": variables["params"]["history_cat_conv"]}
    stats = {"history_time_conv":
             variables["batch_stats"]["history_time_conv"],
             "history_cat_conv":
             variables["batch_stats"]["history_cat_conv"]}

    curr = rng.randn(B, ny, nx, nz, C).astype(np.float32)
    hist = rng.randn(B, ny, nx, nz, T * C).astype(np.float32)
    sweep = np.asarray([[2.0, 3.0]], np.float32)
    th = 0.12
    c2p = np.eye(4, dtype=np.float32)
    c2p[0, 0] = c2p[1, 1] = np.cos(th)
    c2p[0, 1], c2p[1, 0] = -np.sin(th), np.sin(th)
    c2p[0, 3], c2p[1, 3] = 1.3, -0.7

    tstate = TemporalState(
        history_bev=jnp.asarray(np.transpose(hist, (0, 3, 1, 2, 4))),
        sweep_time=jnp.asarray(sweep),
        seq_ids=jnp.zeros((B,), jnp.int32),
        forward_augs=jnp.broadcast_to(jnp.eye(4), (B, 4, 4)),
    )
    meta = dict(start_of_sequence=jnp.zeros((B,), bool),
                sequence_group_idx=jnp.zeros((B,), jnp.int32),
                curr_to_prev_ego_rt=jnp.asarray(c2p)[None])

    def run(module):
        return module.fuse_history(
            jnp.asarray(curr), tstate, meta,
            jnp.broadcast_to(jnp.eye(3), (B, 3, 3)), do_history=True,
            train=False)

    fused, new_state, mism = model.apply(
        {"params": params, "batch_stats": stats}, method=run)
    assert not bool(np.asarray(mism).any())

    # ---- torch oracle (reference math, fbocc.py:169-205, 275, 303-310)
    from fbbev_tpu import geometry
    fp = model.make_forward_projection()
    f2b = np.asarray(geometry.feat2bev_matrix(fp.dx, fp.bx))
    flow = (np.linalg.inv(f2b) @ np.eye(4) @ c2p @ np.eye(4) @ f2b)
    xs_, ys_, zs_ = np.meshgrid(np.arange(nx), np.arange(ny),
                                np.arange(nz), indexing="xy")
    # build normalised grid exactly as geometry.history_flow_grid
    gy, gx, gz = np.meshgrid(np.arange(ny, dtype=np.float32),
                             np.arange(nx, dtype=np.float32),
                             np.arange(nz, dtype=np.float32), indexing="ij")
    g = np.stack([gx, gy, gz, np.ones_like(gx)], -1)
    warped = np.einsum("ij,hwzj->hwzi", flow, g)[..., :3]
    norm = np.array([nx - 1, ny - 1, nz - 1], np.float32)
    grid_n = (warped / norm * 2.0 - 1.0)[None].astype(np.float32)
    # torch grid_sample over (B, C', D=z, H=y, W=x)
    hist_t = torch.from_numpy(
        np.transpose(hist, (0, 4, 3, 1, 2)))  # (B, TC, z, y, x)
    grid_t = torch.from_numpy(
        np.transpose(grid_n, (0, 3, 1, 2, 4)))  # (B, z, h, w, 3)
    sampled_t = F.grid_sample(hist_t, grid_t, align_corners=True)
    sampled = np.transpose(sampled_t.numpy(), (0, 3, 4, 2, 1))  # B,y,x,z,TC

    feats = np.concatenate([curr, sampled], -1)
    frames = feats.reshape(B, ny, nx, nz, T + 1, C)
    frames = np.moveaxis(frames, 4, 1).reshape(B * (T + 1), ny, nx, nz, C)
    # reference increments every slot's sweep time before use (fbocc.py:268)
    sweep_cat = np.concatenate(
        [np.zeros((B, 1), np.float32), sweep + 1.0], 1)
    temb = np.broadcast_to((sweep_cat * 0.5).reshape(B * (T + 1), 1, 1, 1, 1),
                           (B * (T + 1), ny, nx, nz, 1))
    fr = np.concatenate([frames, temb], -1)
    with torch.no_grad():
        # torch layout (N, C, D, H, W) = (N, C, y? ) -- the conv is 1x1x1 so
        # any consistent spatial permutation works
        fr_t = torch.from_numpy(np.transpose(fr, (0, 4, 1, 2, 3)))
        o = tc_time(fr_t).numpy()
    o = np.transpose(o, (0, 2, 3, 4, 1)).reshape(B, T + 1, ny, nx, nz, C)
    o = np.moveaxis(o, 1, 4).reshape(B, ny, nx, nz, (T + 1) * C)
    with torch.no_grad():
        fused_t = tc_cat(torch.from_numpy(
            np.transpose(o, (0, 4, 1, 2, 3)))).numpy()
    fused_t = np.transpose(fused_t, (0, 2, 3, 4, 1))

    np.testing.assert_allclose(np.asarray(fused), fused_t, atol=5e-5,
                               rtol=2e-2)
    # state update: history drops the oldest frame, detached copy (the
    # state buffer is stored z-major)
    np.testing.assert_allclose(
        np.asarray(new_state.history_bev),
        np.transpose(feats[..., :T * C], (0, 3, 1, 2, 4)), atol=5e-5)
    np.testing.assert_allclose(np.asarray(new_state.sweep_time),
                               sweep_cat[:, :-1], atol=0)


# ---------------------------------------------------------------------------
# Zoo backbone oracles (VERDICT r1 item "weak 5": converters need numeric
# parity vs real torch modules, not just shape tests + round-trips).
# ---------------------------------------------------------------------------

class _TorchDLABasicBlock(torch.nn.Module):
    """Reference BasicBlock (dla.py:39-101)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.norm1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.norm2 = torch.nn.BatchNorm2d(cout)

    def forward(self, x, identity=None):
        if identity is None:
            identity = x
        y = torch.relu(self.norm1(self.conv1(x)))
        y = self.norm2(self.conv2(y))
        return torch.relu(y + identity)


class _TorchDLARoot(torch.nn.Module):
    """Reference Root (dla.py:103-156)."""

    def __init__(self, cin, cout, add_identity=False):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, 1, bias=False)
        self.norm = torch.nn.BatchNorm2d(cout)
        self.add_identity = add_identity

    def forward(self, feats):
        x = self.norm(self.conv(torch.cat(feats, 1)))
        if self.add_identity:
            x = x + feats[0]
        return torch.relu(x)


class _TorchDLATree(torch.nn.Module):
    """Reference Tree (dla.py:157-277) with default root kwargs."""

    def __init__(self, levels, cin, cout, stride=1, level_root=False,
                 root_dim=None, add_identity=False):
        super().__init__()
        if root_dim is None:
            root_dim = 2 * cout
        if level_root:
            root_dim += cin
        if levels == 1:
            self.root = _TorchDLARoot(root_dim, cout, add_identity)
            self.tree1 = _TorchDLABasicBlock(cin, cout, stride)
            self.tree2 = _TorchDLABasicBlock(cout, cout, 1)
        else:
            self.tree1 = _TorchDLATree(levels - 1, cin, cout, stride,
                                       add_identity=add_identity)
            self.tree2 = _TorchDLATree(levels - 1, cout, cout,
                                       root_dim=root_dim + cout,
                                       add_identity=add_identity)
        self.level_root = level_root
        self.levels = levels
        self.downsample = (torch.nn.MaxPool2d(stride, stride=stride)
                           if stride > 1 else None)
        self.project = None
        if cin != cout:
            self.project = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, bias=False),
                torch.nn.BatchNorm2d(cout))

    def forward(self, x, identity=None, children=None):
        children = [] if children is None else children
        bottom = self.downsample(x) if self.downsample else x
        identity = self.project(bottom) if self.project else bottom
        if self.level_root:
            children.append(bottom)
        x1 = self.tree1(x, identity)
        if self.levels == 1:
            x2 = self.tree2(x1)
            return self.root([x2, x1] + children)
        children.append(x1)
        return self.tree2(x1, children=children)


class _TorchDLA34(torch.nn.Module):
    """Reference DLANet depth=34 (dla.py:278-430)."""

    def __init__(self):
        super().__init__()
        levels = (1, 1, 1, 2, 2, 1)
        ch = (16, 32, 64, 128, 256, 512)
        self.base_layer = torch.nn.Sequential(
            torch.nn.Conv2d(3, ch[0], 7, 1, 3, bias=False),
            torch.nn.BatchNorm2d(ch[0]), torch.nn.ReLU())
        self.level0 = torch.nn.Sequential(
            torch.nn.Conv2d(ch[0], ch[0], 3, 1, 1, bias=False),
            torch.nn.BatchNorm2d(ch[0]), torch.nn.ReLU())
        self.level1 = torch.nn.Sequential(
            torch.nn.Conv2d(ch[0], ch[1], 3, 2, 1, bias=False),
            torch.nn.BatchNorm2d(ch[1]), torch.nn.ReLU())
        roots = (False, True, True, True)
        for i in range(2, 6):
            self.add_module(f"level{i}",
                            _TorchDLATree(levels[i], ch[i - 1], ch[i],
                                          stride=2,
                                          level_root=roots[i - 2]))

    def forward(self, x):
        outs = []
        x = self.base_layer(x)
        for i in range(6):
            x = getattr(self, f"level{i}")(x)
            outs.append(x)
        return outs


def _randomize_bn(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.5)


def test_dla34_activations_match_torch(rng):
    """torch DLA-34 (reference structure) -> convert_dla_checkpoint ->
    our DLANet must reproduce level4/level5 features exactly."""
    from fbbev_tpu.models.dla import DLANet
    from fbbev_tpu.train.checkpoint_convert import convert_dla_checkpoint

    torch.manual_seed(0)
    tm = _TorchDLA34()
    _randomize_bn(tm)
    tm.eval()

    sd = {f"img_backbone.{k}": v.detach().numpy()
          for k, v in tm.state_dict().items()}
    out = convert_dla_checkpoint(sd)
    assert out["unused_keys"] == []

    x = rng.randn(1, 3, 64, 192).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))

    model = DLANet(arch="dla34", out_indices=(4, 5))
    outs = model.apply({"params": out["params"]["img_backbone"],
                        "batch_stats": out["batch_stats"]["img_backbone"]},
                       jnp.asarray(np.transpose(x, (0, 2, 3, 1))), False)
    for got, want in zip(outs, (ref[4], ref[5])):
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want.numpy(), atol=2e-3, rtol=1e-3)


class _TorchConvNeXtBlock(torch.nn.Module):
    """Reference ConvNeXtBlock (convnext.py:73-168, linear_pw_conv=True)."""

    def __init__(self, dim):
        super().__init__()
        self.depthwise_conv = torch.nn.Conv2d(dim, dim, 7, padding=3,
                                              groups=dim)
        self.norm = torch.nn.LayerNorm(dim, eps=1e-6)
        self.pointwise_conv1 = torch.nn.Linear(dim, 4 * dim)
        self.pointwise_conv2 = torch.nn.Linear(4 * dim, dim)
        self.gamma = torch.nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        s = x
        x = self.depthwise_conv(x).permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.pointwise_conv2(torch.nn.functional.gelu(
            self.pointwise_conv1(x)))
        x = x.permute(0, 3, 1, 2) * self.gamma.view(1, -1, 1, 1)
        return s + x


class _TorchLayerNorm2d(torch.nn.LayerNorm):
    """Reference LayerNorm2d (convnext.py:50-70)."""

    def forward(self, x):
        return torch.nn.functional.layer_norm(
            x.permute(0, 2, 3, 1), self.normalized_shape, self.weight,
            self.bias, self.eps).permute(0, 3, 1, 2)


class _TorchConvNeXtTiny(torch.nn.Module):
    """Reference ConvNeXt arch='tiny' (convnext.py:171-377),
    gap_before_final_norm=False (feature-map outputs for detection)."""

    def __init__(self, out_indices=(2, 3)):
        super().__init__()
        depths, dims = (3, 3, 9, 3), (96, 192, 384, 768)
        self.out_indices = out_indices
        self.downsample_layers = torch.nn.ModuleList()
        self.downsample_layers.append(torch.nn.Sequential(
            torch.nn.Conv2d(3, dims[0], 4, 4),
            _TorchLayerNorm2d(dims[0], eps=1e-6)))
        for i in range(1, 4):
            self.downsample_layers.append(torch.nn.Sequential(
                _TorchLayerNorm2d(dims[i - 1], eps=1e-6),
                torch.nn.Conv2d(dims[i - 1], dims[i], 2, 2)))
        self.stages = torch.nn.ModuleList(
            torch.nn.Sequential(*[_TorchConvNeXtBlock(dims[i])
                                  for _ in range(depths[i])])
            for i in range(4))
        for i in out_indices:
            self.add_module(f"norm{i}", _TorchLayerNorm2d(dims[i], eps=1e-6))

    def forward(self, x):
        outs = []
        for i, stage in enumerate(self.stages):
            x = self.downsample_layers[i](x)
            x = stage(x)
            if i in self.out_indices:
                outs.append(getattr(self, f"norm{i}")(x))
        return outs


def test_convnext_activations_match_torch(rng):
    """torch ConvNeXt-tiny (reference structure) ->
    convert_convnext_checkpoint -> our ConvNeXt: identical stage-2/3
    feature maps."""
    from fbbev_tpu.models.convnext import ConvNeXt
    from fbbev_tpu.train.checkpoint_convert import convert_convnext_checkpoint

    torch.manual_seed(1)
    tm = _TorchConvNeXtTiny()
    # non-degenerate weights: defaults give ~0 outputs through layer scale
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    tm.eval()

    sd = {f"img_backbone.{k}": v.detach().numpy()
          for k, v in tm.state_dict().items()}
    out = convert_convnext_checkpoint(sd, arch="tiny")
    assert out["unused_keys"] == []

    x = rng.randn(1, 3, 64, 192).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))

    model = ConvNeXt(arch="tiny", out_indices=(2, 3))
    outs = model.apply({"params": out["params"]["img_backbone"]},
                       jnp.asarray(np.transpose(x, (0, 2, 3, 1))), False)
    for got, want in zip(outs, ref):
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want.numpy(), atol=2e-3, rtol=1e-3)


class _TorchOSA(torch.nn.Module):
    """Reference _OSA_module (vovnet.py:189-250, non-depthwise); the eSE
    is applied unconditionally in _forward."""

    def __init__(self, cin, stage_ch, concat_ch, layer_per_block, name,
                 identity=False):
        super().__init__()
        from collections import OrderedDict
        self.identity = identity
        self.layers = torch.nn.ModuleList()
        c = cin
        for i in range(layer_per_block):
            self.layers.append(torch.nn.Sequential(OrderedDict([
                (f"{name}_{i}/conv",
                 torch.nn.Conv2d(c, stage_ch, 3, 1, 1, bias=False)),
                (f"{name}_{i}/norm", torch.nn.BatchNorm2d(stage_ch)),
                (f"{name}_{i}/relu", torch.nn.ReLU())])))
            c = stage_ch
        cat_in = cin + layer_per_block * stage_ch
        self.concat = torch.nn.Sequential(OrderedDict([
            (f"{name}_concat/conv",
             torch.nn.Conv2d(cat_in, concat_ch, 1, bias=False)),
            (f"{name}_concat/norm", torch.nn.BatchNorm2d(concat_ch)),
            (f"{name}_concat/relu", torch.nn.ReLU())]))
        self.ese = torch.nn.Module()
        self.ese.fc = torch.nn.Conv2d(concat_ch, concat_ch, 1)

    def forward(self, x):
        idn = x
        outs = [x]
        for layer in self.layers:
            x = layer(x)
            outs.append(x)
        x = self.concat(torch.cat(outs, 1))
        s = torch.nn.functional.relu6(
            self.ese.fc(x.mean((2, 3), keepdim=True)) + 3.0) / 6.0
        x = x * s
        if self.identity:
            x = x + idn
        return x


class _TorchVoVNet19(torch.nn.Module):
    """Reference VoVNetCP spec V-19-eSE (vovnet.py:50-58, 288-384)."""

    def __init__(self):
        super().__init__()
        from collections import OrderedDict
        stem_ch = (64, 64, 128)
        stem = []
        for i, (cin, cout, s) in enumerate(
                [(3, 64, 2), (64, 64, 1), (64, 128, 2)]):
            stem += [(f"stem_{i + 1}/conv",
                      torch.nn.Conv2d(cin, cout, 3, s, 1, bias=False)),
                     (f"stem_{i + 1}/norm", torch.nn.BatchNorm2d(cout)),
                     (f"stem_{i + 1}/relu", torch.nn.ReLU())]
        self.stem = torch.nn.Sequential(OrderedDict(stem))
        conv_ch = (128, 160, 192, 224)
        out_ch = (256, 512, 768, 1024)
        cin = 128
        for i in range(4):
            n = i + 2
            stage = torch.nn.Sequential()
            if n != 2:
                stage.add_module("Pooling",
                                 torch.nn.MaxPool2d(3, 2, ceil_mode=True))
            stage.add_module(f"OSA{n}_1",
                             _TorchOSA(cin, conv_ch[i], out_ch[i], 3,
                                       f"OSA{n}_1"))
            self.add_module(f"stage{n}", stage)
            cin = out_ch[i]

    def forward(self, x):
        x = self.stem(x)
        outs = []
        for n in range(2, 6):
            x = getattr(self, f"stage{n}")(x)
            outs.append(x)
        return outs


def test_vovnet_activations_match_torch(rng):
    """torch VoVNet-19-eSE (reference structure incl. ceil-mode stage
    pools) -> convert_vovnet_checkpoint -> our VoVNetCP: identical
    stage-4/5 features."""
    from fbbev_tpu.models.vovnet import VoVNetCP
    from fbbev_tpu.train.checkpoint_convert import convert_vovnet_checkpoint

    torch.manual_seed(2)
    tm = _TorchVoVNet19()
    _randomize_bn(tm, seed=2)
    tm.eval()

    sd = {f"img_backbone.{k}": v.detach().numpy()
          for k, v in tm.state_dict().items()}
    out = convert_vovnet_checkpoint(sd, spec_name="V-19-eSE")
    assert out["unused_keys"] == []

    x = rng.randn(1, 3, 64, 192).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))

    model = VoVNetCP(spec_name="V-19-eSE", out_indices=(2, 3))
    outs = model.apply({"params": out["params"]["img_backbone"],
                        "batch_stats": out["batch_stats"]["img_backbone"]},
                       jnp.asarray(np.transpose(x, (0, 2, 3, 1))), False)
    for got, want in zip(outs, (ref[2], ref[3])):
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want.numpy(), atol=2e-3, rtol=1e-3)


class _TorchWindowMSA(torch.nn.Module):
    """Reference WindowMSA (swin.py:244-352) incl. the double_step_seq
    relative-position index."""

    def __init__(self, dim, heads, ws):
        super().__init__()
        self.heads, self.ws = heads, ws
        self.scale = (dim // heads) ** -0.5
        self.relative_position_bias_table = torch.nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02)
        s1 = torch.arange(0, (2 * ws - 1) * ws, 2 * ws - 1)
        s2 = torch.arange(0, ws)
        ric = (s1[:, None] + s2[None, :]).reshape(1, -1)
        self.register_buffer("relative_position_index",
                             (ric + ric.T).flip(1).contiguous())
        self.qkv = torch.nn.Linear(dim, dim * 3)
        self.proj = torch.nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads,
                                  C // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(
                self.ws * self.ws, self.ws * self.ws, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = (attn.view(B // nW, nW, self.heads, N, N)
                    + mask.unsqueeze(1).unsqueeze(0)).view(-1, self.heads,
                                                           N, N)
        attn = attn.softmax(-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(B, N, C))


class _TorchShiftWindowMSA(torch.nn.Module):
    """Reference ShiftWindowMSA (swin.py:355-513)."""

    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.w_msa = _TorchWindowMSA(dim, heads, ws)

    def _partition(self, x):
        B, H, W, C = x.shape
        ws = self.ws
        x = x.view(B, H // ws, ws, W // ws, ws, C)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)

    def forward(self, q, hw):
        import torch.nn.functional as F
        B, L, C = q.shape
        H, W = hw
        q = q.view(B, H, W, C)
        ws = self.ws
        pad_r, pad_b = (-W) % ws, (-H) % ws
        q = F.pad(q, (0, 0, 0, pad_r, 0, pad_b))
        Hp, Wp = H + pad_b, W + pad_r
        mask = None
        if self.shift:
            q = torch.roll(q, (-self.shift, -self.shift), dims=(1, 2))
            img = torch.zeros((1, Hp, Wp, 1))
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -self.shift),
                       slice(-self.shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -self.shift),
                            slice(-self.shift, None)):
                    img[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = self._partition(img).reshape(-1, ws * ws)
            mask = mw.unsqueeze(1) - mw.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -100.0)
        xw = self._partition(q).reshape(-1, ws * ws, C)
        out = self.w_msa(xw, mask).reshape(-1, ws, ws, C)
        out = out.view(B, Hp // ws, Wp // ws, ws, ws, C)
        out = out.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        if self.shift:
            out = torch.roll(out, (self.shift, self.shift), dims=(1, 2))
        return out[:, :H, :W].reshape(B, H * W, C)


class _TorchSwinBlock(torch.nn.Module):
    """Reference SwinBlock (swin.py:516-593); FFN = mmcv FFN with
    Sequential(Linear, GELU) + Linear -> ffn.layers.0.0 / ffn.layers.1."""

    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim)
        self.attn = _TorchShiftWindowMSA(dim, heads, ws, shift)
        self.norm2 = torch.nn.LayerNorm(dim)
        self.ffn = torch.nn.Module()
        self.ffn.layers = torch.nn.ModuleList([
            torch.nn.Sequential(torch.nn.Linear(dim, 4 * dim),
                                torch.nn.GELU()),
            torch.nn.Linear(4 * dim, dim)])

    def forward(self, x, hw):
        x = x + self.attn(self.norm1(x), hw)
        y = self.norm2(x)
        y = self.ffn.layers[1](self.ffn.layers[0](y))
        return x + y


class _TorchSwinTiny(torch.nn.Module):
    """Reference SwinTransformer arch tiny (depths 2,2,6,2; heads
    3,6,12,24; embed 96), out_indices (2, 3)."""

    def __init__(self, ws=7):
        super().__init__()
        depths, heads, embed = (2, 2, 6, 2), (3, 6, 12, 24), 96
        self.patch_embed = torch.nn.Module()
        self.patch_embed.projection = torch.nn.Conv2d(3, embed, 4, 4)
        self.patch_embed.norm = torch.nn.LayerNorm(embed)
        self.stages = torch.nn.ModuleList()
        for i, d in enumerate(depths):
            dim = embed * 2 ** i
            stage = torch.nn.Module()
            stage.blocks = torch.nn.ModuleList([
                _TorchSwinBlock(dim, heads[i], ws,
                                0 if j % 2 == 0 else ws // 2)
                for j in range(d)])
            if i < 3:
                stage.downsample = torch.nn.Module()
                stage.downsample.sampler = torch.nn.Unfold(2, stride=2)
                stage.downsample.norm = torch.nn.LayerNorm(4 * dim)
                stage.downsample.reduction = torch.nn.Linear(
                    4 * dim, 2 * dim, bias=False)
            self.stages.append(stage)
        self.norm2 = torch.nn.LayerNorm(embed * 4)
        self.norm3 = torch.nn.LayerNorm(embed * 8)

    def forward(self, x):
        import torch.nn.functional as F
        x = self.patch_embed.projection(x)
        H, W = x.shape[2], x.shape[3]
        x = self.patch_embed.norm(x.flatten(2).transpose(1, 2))
        outs = []
        for i, stage in enumerate(self.stages):
            for blk in stage.blocks:
                x = blk(x, (H, W))
            if i in (2, 3):
                normed = getattr(self, f"norm{i}")(x)
                outs.append(normed.view(-1, H, W, normed.shape[-1])
                            .permute(0, 3, 1, 2))
            if i < 3:
                y = x.view(-1, H, W, x.shape[-1]).permute(0, 3, 1, 2)
                if H % 2 or W % 2:
                    y = F.pad(y, (0, W % 2, 0, H % 2))
                y = stage.downsample.sampler(y).transpose(1, 2)
                x = stage.downsample.reduction(stage.downsample.norm(y))
                H, W = (H + 1) // 2, (W + 1) // 2
        return outs


def test_swin_activations_match_torch(rng):
    """torch Swin-tiny (reference/mmcv structure: double_step_seq rel-pos
    index, Unfold patch merging, shifted-window masks) ->
    convert_swin_checkpoint -> our SwinTransformer: identical stage-2/3
    features."""
    from fbbev_tpu.models.swin import SwinTransformer
    from fbbev_tpu.train.checkpoint_convert import convert_swin_checkpoint

    torch.manual_seed(3)
    tm = _TorchSwinTiny()
    tm.eval()

    sd = {f"img_backbone.{k}": v.detach().numpy()
          for k, v in tm.state_dict().items()
          if not k.endswith("relative_position_index")}
    out = convert_swin_checkpoint(sd, arch="tiny")
    assert out["unused_keys"] == []

    x = rng.randn(1, 3, 64, 192).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))

    model = SwinTransformer(arch="tiny", out_indices=(2, 3))
    outs = model.apply({"params": out["params"]["img_backbone"]},
                       jnp.asarray(np.transpose(x, (0, 2, 3, 1))), False)
    for got, want in zip(outs, ref):
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want.numpy(), atol=3e-3, rtol=1e-3)
