import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbbev_tpu import geometry
from fbbev_tpu.models import (
    BackwardProjection, CM_DepthNet, CustomFPN, CustomResNet3D, FPN3D,
    FBOCC, OccHead, ResNet)
from fbbev_tpu.models.depth_net import get_mlp_input
from fbbev_tpu.models.fbocc import init_temporal_state


def _cam(B=1, N=2):
    intr = np.diag([500.0, 500.0, 1.0]).astype(np.float32)
    intr[0, 2], intr[1, 2] = 88.0, 32.0
    return geometry.CamParams(
        rots=jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        trans=jnp.asarray(np.tile([[0.0, 0.0, 1.5]], (B, N, 1))),
        intrins=jnp.broadcast_to(jnp.asarray(intr), (B, N, 3, 3)),
        post_rots=jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        post_trans=jnp.zeros((B, N, 3)),
        bda=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
    )


def _batch(rng, B=1, N=2, H=64, W=176, start=True):
    cam = _cam(B, N)
    return dict(
        imgs=jnp.asarray(rng.randn(B, N, H, W, 3).astype(np.float32)),
        rots=cam.rots, trans=cam.trans, intrins=cam.intrins,
        post_rots=cam.post_rots, post_trans=cam.post_trans, bda=cam.bda,
        start_of_sequence=jnp.full((B,), start, bool),
        sequence_group_idx=jnp.zeros((B,), jnp.int32),
        curr_to_prev_ego_rt=jnp.broadcast_to(jnp.eye(4), (B, 4, 4)),
    )


def test_resnet50_shapes(rng):
    m = ResNet(depth=50, out_indices=(2, 3))
    x = jnp.zeros((1, 64, 176, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    assert outs[0].shape == (1, 4, 11, 1024)
    assert outs[1].shape == (1, 2, 6, 2048)


def test_fpn_shapes(rng):
    m = CustomFPN(in_channels=(1024, 2048), out_channels=256, out_ids=(0,))
    ins = [jnp.zeros((1, 4, 11, 1024)), jnp.zeros((1, 2, 6, 2048))]
    variables = m.init(jax.random.PRNGKey(0), ins)
    outs = m.apply(variables, ins)
    assert len(outs) == 1 and outs[0].shape == (1, 4, 11, 256)


def test_mlp_input_layout():
    cam = _cam(1, 2)
    v = np.asarray(get_mlp_input(cam))
    assert v.shape == (1, 2, 27)
    np.testing.assert_allclose(v[0, 0, :4], [500.0, 500.0, 88.0, 32.0])
    np.testing.assert_allclose(v[0, 0, 15:27].reshape(3, 4)[:, 3],
                               [0.0, 0.0, 1.5])


def test_depth_net(rng):
    m = CM_DepthNet(in_channels=64, mid_channels=64, context_channels=80,
                    depth_channels=80)
    x = jnp.asarray(rng.randn(1, 2, 4, 11, 64).astype(np.float32))
    mlp = jnp.asarray(rng.randn(1, 2, 27).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x, mlp)
    ctx, depth = m.apply(variables, x, mlp)
    assert ctx.shape == (1, 2, 4, 11, 80)
    assert depth.shape == (1, 2, 80, 4, 11)
    np.testing.assert_allclose(
        np.asarray(depth.sum(axis=2)), np.ones((1, 2, 4, 11)), atol=1e-5)


def test_context_net_matches_depth_net_context_branch(rng):
    """CM_ContextNet (ref depth_net.py:455-500) reuses CM_DepthNet's exact
    context-branch structure; grafting the branch params from an
    initialized CM_DepthNet must reproduce its context output bit-exact."""
    from fbbev_tpu.models.depth_net import CM_ContextNet

    dn = CM_DepthNet(in_channels=64, mid_channels=64, context_channels=80,
                     depth_channels=80)
    cn = CM_ContextNet(in_channels=64, mid_channels=64, context_channels=80)
    x = jnp.asarray(rng.randn(1, 2, 4, 11, 64).astype(np.float32))
    mlp = jnp.asarray(rng.randn(1, 2, 27).astype(np.float32))
    dn_vars = dn.init(jax.random.PRNGKey(0), x, mlp)
    branch = ("param_bn", "reduce_conv", "context_mlp", "context_se",
              "context_conv")
    cn_vars = {
        col: {k: tree[k] for k in branch if k in tree}
        for col, tree in dn_vars.items()
    }
    ctx_dn, _ = dn.apply(dn_vars, x, mlp)
    ctx_cn = cn.apply(cn_vars, x, mlp)
    assert ctx_cn.shape == (1, 2, 4, 11, 80)
    np.testing.assert_array_equal(np.asarray(ctx_cn), np.asarray(ctx_dn))


def test_backward_projection(rng):
    B, N, C = 1, 2, 80
    m = BackwardProjection(bev_h=20, bev_w=20, embed_dims=C,
                           feedforward_channels=4 * C,
                           input_size=(64, 176))
    cam = _cam(B, N)
    feats = jnp.asarray(rng.randn(B, N, 4, 11, C).astype(np.float32))
    lss = jnp.asarray(rng.randn(B, 20, 20, C).astype(np.float32))
    depth = jax.nn.softmax(
        jnp.asarray(rng.randn(B, N, 80, 4, 11)), axis=2)
    variables = m.init(jax.random.PRNGKey(0), feats, lss, cam, depth)
    out = m.apply(variables, feats, lss, cam, depth)
    assert out.shape == (B, 20, 20, C)
    assert np.isfinite(np.asarray(out)).all()

    # operation_order sequencing (MyCustomBaseTransformerLayer parity,
    # custom_base_transformer_layer.py:89-260): the default order keeps
    # the exact param tree; a reordered/extended program builds and runs
    p0 = variables["params"]["layer0"]
    assert {"self_attn", "cross_attn", "ffn", "norm1", "norm2",
            "norm3"} <= set(p0.keys())
    m2 = BackwardProjection(
        bev_h=20, bev_w=20, embed_dims=C, feedforward_channels=4 * C,
        input_size=(64, 176),
        operation_order=("norm", "cross_attn", "norm", "self_attn",
                         "norm", "ffn"))
    v2 = m2.init(jax.random.PRNGKey(0), feats, lss, cam, depth)
    out2 = m2.apply(v2, feats, lss, cam, depth)
    assert out2.shape == (B, 20, 20, C)
    assert np.isfinite(np.asarray(out2)).all()


def test_bev_encoder_stack(rng):
    bb = CustomResNet3D(block_inplanes=(16, 32, 64))
    x = jnp.asarray(rng.randn(1, 40, 40, 8, 24).astype(np.float32))
    v1 = bb.init(jax.random.PRNGKey(0), x)
    outs = bb.apply(v1, x)
    assert [o.shape for o in outs] == [
        (1, 40, 40, 8, 16), (1, 20, 20, 4, 32), (1, 10, 10, 2, 64)]

    neck = FPN3D(in_channels=(16, 32, 64), out_channels=32)
    v2 = neck.init(jax.random.PRNGKey(0), outs)
    fpn_outs = neck.apply(v2, outs)
    assert [o.shape[-1] for o in fpn_outs] == [32, 32, 32]
    assert fpn_outs[0].shape[1:4] == (40, 40, 8)

    head = OccHead(in_channels=(32, 32, 32), out_channel=19)
    v3 = head.init(jax.random.PRNGKey(0), fpn_outs)
    logits = head.apply(v3, fpn_outs)
    assert logits.shape == (1, 80, 80, 16, 19)


class TestFBOCC:
    @pytest.fixture(scope="class")
    def model_and_vars(self):
        rng = np.random.RandomState(0)
        # plain warp: the tiled path is covered by test_grid_sample and is
        # slow to compile on CPU at the 100x100 grid
        model = FBOCC(input_size=(64, 176), num_cams=2, history_cat_num=4,
                      use_tiled_warp=False)
        batch = _batch(rng, B=1, N=2)
        state = init_temporal_state(1, (100, 100, 8), 4, 80)
        variables = model.init(jax.random.PRNGKey(0), batch, state)
        return model, variables, batch, state

    def test_forward_shapes(self, model_and_vars):
        model, variables, batch, state = model_and_vars
        out, new_state = model.apply(variables, batch, state)
        assert out["occ_logits"].shape == (1, 200, 200, 16, 19)
        assert out["depth"].shape == (1, 2, 80, 4, 11)
        assert new_state.history_bev.shape == (1, 8, 100, 100, 4 * 80)
        assert np.isfinite(np.asarray(out["occ_logits"])).all()

    def test_temporal_sweep_times(self, model_and_vars):
        model, variables, batch, state = model_and_vars
        _, s1 = model.apply(variables, batch, state)
        np.testing.assert_array_equal(np.asarray(s1.sweep_time), [[0, 0, 0, 0]])
        batch2 = dict(batch)
        batch2["start_of_sequence"] = jnp.zeros((1,), bool)
        _, s2 = model.apply(variables, batch2, s1)
        np.testing.assert_array_equal(np.asarray(s2.sweep_time), [[0, 1, 1, 1]])
        _, s3 = model.apply(variables, batch2, s2)
        np.testing.assert_array_equal(np.asarray(s3.sweep_time), [[0, 1, 2, 2]])

    def test_seq_mismatch_diagnostic(self, model_and_vars):
        model, variables, batch, state = model_and_vars
        _, s1 = model.apply(variables, batch, state)
        bad = dict(batch)
        bad["start_of_sequence"] = jnp.zeros((1,), bool)
        bad["sequence_group_idx"] = jnp.asarray([7], jnp.int32)
        out, _ = model.apply(variables, bad, s1)
        assert bool(out["seq_mismatch"][0])

    def test_uninitialised_state_resets(self, model_and_vars):
        """A fresh all-zeros state with start_of_sequence=False must not
        blend garbage history (seq_ids < 0 forces a reset)."""
        model, variables, batch, _ = model_and_vars
        state = init_temporal_state(1, (100, 100, 8), 4, 80)
        b = dict(batch)
        b["start_of_sequence"] = jnp.zeros((1,), bool)
        out, new_state = model.apply(variables, b, state)
        assert np.isfinite(np.asarray(out["occ_logits"])).all()
        assert int(new_state.seq_ids[0]) == 0

    def test_train_mode_mutates_batch_stats(self, model_and_vars):
        model, variables, batch, state = model_and_vars
        (out, _), updated = model.apply(
            variables, batch, state, train=True, mutable=["batch_stats"])
        flat_before = jax.tree.leaves(variables["batch_stats"])
        flat_after = jax.tree.leaves(updated["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(flat_before, flat_after))
        assert changed


def test_rebatch_matches_dense(rng):
    """Static per-camera rebatching must equal the dense masked path when
    max_queries_per_cam fits every camera's visible count."""
    from fbbev_tpu.models.bevformer import DepthAwareSpatialCrossAttention
    B, N, Q, Z, C, DC, Hf, Wf = 1, 2, 36, 4, 16, 10, 4, 6
    r = np.random.RandomState(0)
    query = jnp.asarray(r.randn(B, Q, C).astype(np.float32))
    qpos = jnp.asarray(r.randn(B, Q, C).astype(np.float32))
    feats = jnp.asarray(r.randn(B, N, Hf, Wf, C).astype(np.float32))
    ref = jnp.asarray(r.rand(B, N, Q, Z, 2).astype(np.float32))
    mask = jnp.asarray(r.rand(B, N, Q, Z) < 0.4)
    qdepth = jnp.asarray((r.rand(B, N, Q, Z) * 40).astype(np.float32))
    pdepth = jnp.asarray(r.rand(B, N, DC, Hf, Wf).astype(np.float32))

    dense = DepthAwareSpatialCrossAttention(
        embed_dims=C, num_cams=N, dbound=(2.0, 42.0, 4.0),
        max_queries_per_cam=None)
    reb = DepthAwareSpatialCrossAttention(
        embed_dims=C, num_cams=N, dbound=(2.0, 42.0, 4.0),
        max_queries_per_cam=Q)  # K == Q: no overflow possible
    v = dense.init(jax.random.PRNGKey(0), query, qpos, feats, ref, mask,
                   qdepth, pdepth)
    a = dense.apply(v, query, qpos, feats, ref, mask, qdepth, pdepth)
    b = reb.apply(v, query, qpos, feats, ref, mask, qdepth, pdepth)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_vovnet_shapes(rng):
    from fbbev_tpu.models.vovnet import VoVNetCP
    m = VoVNetCP(spec_name="V-39-eSE", out_indices=(2, 3))
    x = jnp.zeros((1, 64, 176, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert outs[0].shape == (1, 4, 11, 768)
    # ceil-mode stage pools (torch MaxPool2d(3,2,ceil_mode=True)): 11 -> 5,
    # not the 6 the old padding=1 pool produced
    assert outs[1].shape == (1, 2, 5, 1024)


def test_convnext_shapes(rng):
    from fbbev_tpu.models.convnext import ConvNeXt
    m = ConvNeXt(arch="tiny", out_indices=(2, 3))
    x = jnp.zeros((1, 64, 176, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert outs[0].shape == (1, 4, 11, 384)
    assert outs[1].shape == (1, 2, 6, 768)


def test_swin_shapes(rng):
    from fbbev_tpu.models.swin import SwinTransformer
    m = SwinTransformer(arch="tiny", out_indices=(2, 3))
    x = jnp.asarray(rng.randn(1, 64, 176, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert outs[0].shape == (1, 4, 11, 384)
    assert outs[1].shape == (1, 2, 6, 768)
    assert np.isfinite(np.asarray(outs[0])).all()


def test_swin_shift_invariance_smoke(rng):
    """Shifted-window mask: moving content far from window boundaries must
    not leak attention across disconnected regions (finite + different
    from unshifted output)."""
    from fbbev_tpu.models.swin import SwinBlock
    x = jnp.asarray(rng.randn(1, 14, 14, 32).astype(np.float32))
    b0 = SwinBlock(32, 4, window=7, shift=0)
    b1 = SwinBlock(32, 4, window=7, shift=3)
    v0 = b0.init(jax.random.PRNGKey(0), x)
    out0 = b0.apply(v0, x)
    out1 = b1.apply(v0, x)
    assert np.isfinite(np.asarray(out1)).all()
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_dla_shapes(rng):
    from fbbev_tpu.models.dla import DLANet
    m = DLANet(arch="dla34", out_indices=(4, 5))
    # W divisible by 64: like the reference's 256x704 deployment shapes,
    # DLA's floor-mode tree maxpool requires even H/W at every level.
    x = jnp.asarray(rng.randn(1, 64, 192, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert outs[0].shape == (1, 4, 12, 256)
    assert outs[1].shape == (1, 2, 6, 512)
    assert np.isfinite(np.asarray(outs[0])).all()


def test_eval_kernel_composition(rng, monkeypatch):
    """Full FBOCC eval forward with ALL Pallas eval kernels forced through
    the interpreter (fuse_warp + conv3d + occfuse) vs the XLA fallback
    path -- the composition that runs on TPU when the fast eval config is
    enabled.  Streamed over 3 frames so the ring-slot history state is
    exercised (outputs must match; state representations differ by
    design, ops/pallas_fuse_warp.py)."""
    from fbbev_tpu.models import layers

    grid = dict(x=(-40.0, 40.0, 4.0), y=(-40.0, 40.0, 4.0),
                z=(-1.0, 5.4, 0.8), depth=(2.0, 42.0, 2.0))
    bgrid = dict(x=(-40.0, 40.0, 4.0), y=(-40.0, 40.0, 4.0),
                 z=(-1.0, 5.4, 1.6))
    model = FBOCC(grid_config=grid, bevformer_grid_config=bgrid,
                  input_size=(64, 176), num_cams=2, history_cat_num=8,
                  voxel_channels=(64, 128, 128), voxel_out_channels=128,
                  depth_channels=20, dtype=jnp.bfloat16)
    state0 = init_temporal_state(1, (20, 20, 8), 8, 80,
                                 dtype=jnp.bfloat16)
    batches = [_batch(rng, start=(i == 0)) for i in range(3)]
    variables = model.init(jax.random.PRNGKey(0), batches[0], state0)

    def run():
        st, outs = state0, []
        for b in batches:
            o, st = model.apply(variables, b, st, train=False)
            outs.append(np.asarray(o["occ_logits"]))
        return outs

    ref = run()

    monkeypatch.setenv("FBBEV_FORCE_FUSE_WARP", "interpret")
    monkeypatch.setenv("FBBEV_FORCE_PALLAS_CONV3D", "interpret")
    monkeypatch.setenv("FBBEV_OCCFUSE", "1")
    monkeypatch.setenv("FBBEV_FORCE_OCCFUSE", "interpret")
    monkeypatch.setattr(layers, "_PALLAS_CONV3D", True)
    fast = run()

    for i, (a, b) in enumerate(zip(ref, fast)):
        # both paths run bf16; differences are kernel-vs-XLA rounding
        np.testing.assert_allclose(a, b, rtol=0.06, atol=0.06,
                                   err_msg=f"frame {i}")


def test_zoo_lss_2d_equals_3d_zsum(rng):
    """Zoo LSSViewTransformer (view_transformer.py:16-330): the 2D BEV is
    exactly the z-collapse of the 3D splat on a single-z-bin grid."""
    import jax
    import jax.numpy as jnp

    from fbbev_tpu import geometry
    from fbbev_tpu.models.lss import (LSSViewTransformer,
                                      LSSViewTransformer3D)
    grid = {"x": (-40., 40., 3.2), "y": (-40., 40., 3.2),
            "z": (-1., 5.4, .8), "depth": (2., 42., 2.)}
    vt = LSSViewTransformer(grid, (64, 128), 16, 16)
    B, N = 1, 2
    intr = np.diag([200., 200., 1.]).astype(np.float32)
    intr[0, 2], intr[1, 2] = 64., 32.
    cam = geometry.CamParams(
        rots=jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        trans=jnp.zeros((B, N, 3)),
        intrins=jnp.broadcast_to(jnp.asarray(intr), (B, N, 3, 3)),
        post_rots=jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        post_trans=jnp.zeros((B, N, 3)),
        bda=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)))
    depth = jax.nn.softmax(jnp.asarray(rng.randn(B, N, vt.D, 4, 8)), 2)
    ctx = jnp.asarray(rng.randn(B, N, 4, 8, 16).astype(np.float32))
    out = vt(cam, ctx, depth)
    assert out.shape == (1, 25, 25, 16)
    out3 = LSSViewTransformer3D(grid, (64, 128), 16)(cam, ctx, depth)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out3.sum(3)),
                               atol=1e-5)


def test_occ_head_coarse_pred_equivalence(monkeypatch):
    """FBBEV_OCC_COARSE_PRED pushes pred_conv1 through the blend
    (conv1(sum up(f_i) w_i) == sum up(conv1(f_i)) w_i) and must match the
    reference-ordered path to float tolerance, in eval AND vs the train
    path on the same params."""
    rng = np.random.RandomState(7)
    feats = [jnp.asarray(rng.randn(1, s, s, z, 32).astype(np.float32))
             for s, z in ((40, 8), (20, 4), (10, 2))]
    head = OccHead(in_channels=(32, 32, 32), out_channel=19)
    monkeypatch.setenv("FBBEV_OCC_COARSE_PRED", "1")
    variables = head.init(jax.random.PRNGKey(0), feats)
    fast = head.apply(variables, feats)
    monkeypatch.setenv("FBBEV_OCC_COARSE_PRED", "0")
    ref = head.apply(variables, feats)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-4)
    # param tree is ConvBN-compatible (conv/bn children under pred_conv1)
    assert set(variables["params"]["pred_conv1"]) == {"conv", "bn"}
