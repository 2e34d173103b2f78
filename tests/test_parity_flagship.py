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
