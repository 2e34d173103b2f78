import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbbev_tpu.models import FBOCC
from fbbev_tpu.models.fbocc import init_temporal_state
from fbbev_tpu.train import Trainer, make_optimizer
from fbbev_tpu.train.ema import megvii_ema_decay

# a small grid so CPU tests stay quick: 25x25x8 voxels -> 50x50x16 occ out
TINY_GRID = {
    "x": (-40.0, 40.0, 3.2),
    "y": (-40.0, 40.0, 3.2),
    "z": (-1.0, 5.4, 0.8),
    "depth": (2.0, 42.0, 0.5),
}
TINY_BEVFORMER_GRID = {
    "x": (-40.0, 40.0, 3.2),
    "y": (-40.0, 40.0, 3.2),
    "z": (-1.0, 5.4, 1.6),
}


def tiny_model():
    return FBOCC(grid_config=TINY_GRID,
                 bevformer_grid_config=TINY_BEVFORMER_GRID,
                 input_size=(64, 176), num_cams=2, history_cat_num=2,
                 voxel_channels=(16, 32, 64), voxel_out_channels=32)


def tiny_batch(rng, B=2, N=2, with_gt=True):
    intr = np.diag([200.0, 200.0, 1.0]).astype(np.float32)
    intr[0, 2], intr[1, 2] = 88.0, 32.0
    batch = dict(
        imgs=jnp.asarray(rng.randn(B, N, 64, 176, 3).astype(np.float32)),
        rots=jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        trans=jnp.zeros((B, N, 3)),
        intrins=jnp.broadcast_to(jnp.asarray(intr), (B, N, 3, 3)),
        post_rots=jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        post_trans=jnp.zeros((B, N, 3)),
        bda=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        start_of_sequence=jnp.ones((B,), bool),
        sequence_group_idx=jnp.arange(B, dtype=jnp.int32),
        curr_to_prev_ego_rt=jnp.broadcast_to(jnp.eye(4), (B, 4, 4)),
    )
    if with_gt:
        occ = rng.randint(0, 19, size=(B, 50, 50, 16))
        occ = np.where(rng.rand(B, 50, 50, 16) < 0.3, 255, occ)
        batch["gt_occupancy"] = jnp.asarray(occ)
        gt_depth = rng.rand(B, N, 64, 176).astype(np.float32) * 45
        gt_depth = np.where(rng.rand(B, N, 64, 176) < 0.9, 0.0, gt_depth)
        batch["gt_depth"] = jnp.asarray(gt_depth)
    return batch


def test_megvii_ema_decay():
    assert float(megvii_ema_decay(jnp.asarray(0.0))) == 0.0
    d = float(megvii_ema_decay(jnp.asarray(10560.0)))
    assert 0.99 < d < 0.999


class TestTrainer:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.RandomState(0)
        model = tiny_model()
        trainer = Trainer(model)
        batch = tiny_batch(rng)
        tstate = init_temporal_state(2, (25, 25, 8), 2, 80)
        state = trainer.init_state(jax.random.PRNGKey(0), batch, tstate)
        return trainer, state, tstate, batch

    def test_train_step_runs_and_updates(self, setup):
        trainer, state, tstate, batch = setup
        s1, t1, metrics = trainer.train_step(state, tstate, batch,
                                             do_history=False)
        assert int(s1.step) == 1
        for k, v in metrics.items():
            assert np.isfinite(np.asarray(v)).all(), k
        assert metrics["loss_total"] > 0
        assert int(metrics["seq_mismatch"]) == 0
        # params actually moved
        p0 = jax.tree.leaves(state.params)[0]
        p1 = jax.tree.leaves(s1.params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))

    def test_loss_decreases_on_fixed_batch(self, setup):
        trainer, state, tstate, batch = setup
        first = None
        for i in range(4):
            state, _, metrics = trainer.train_step(
                state, tstate, batch, do_history=False)
            if first is None:
                first = float(metrics["loss_total"])
        assert float(metrics["loss_total"]) < first

    def test_eval_step_uses_ema(self, setup):
        trainer, state, tstate, batch = setup
        out, new_t = trainer.eval_step(state, tstate, batch)
        assert out["occ_logits"].shape == (2, 50, 50, 16, 19)
        assert np.isfinite(np.asarray(out["occ_logits"])).all()


def test_gradients_reach_every_component():
    """Every top-level parameter group must receive nonzero gradient from
    the combined loss (catches silently-detached branches)."""
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    model = tiny_model()
    trainer = Trainer(model)
    batch = tiny_batch(rng, B=2)
    tstate = init_temporal_state(2, (25, 25, 8), 2, 80)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, tstate)

    def loss_fn(params):
        (outputs, _), _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch, tstate, train=True, do_history=True,
            mutable=["batch_stats"])
        losses = trainer._losses(outputs, batch)
        return sum(losses.values())

    grads = jax.grad(loss_fn)(state.params)
    for group, tree in grads.items():
        norms = [float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(tree)]
        assert sum(norms) > 0, f"no gradient reaches {group}"


def test_freeze_submodules_pins_params_and_bn_stats():
    """freeze=('img_backbone',): one train step must leave the backbone's
    params AND BN running stats bit-identical while everything else moves
    (reference freeze options, tools/train.py:245-275)."""
    rng = np.random.RandomState(1)
    model = tiny_model()
    frozen = ("img_backbone",)
    trainer = Trainer(model, optimizer=make_optimizer(frozen=frozen),
                      frozen=frozen)
    batch = tiny_batch(rng)
    tstate = init_temporal_state(2, (25, 25, 8), 2, 80)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, tstate)
    s1, _, metrics = trainer.train_step(state, tstate, batch,
                                        do_history=False)
    assert np.isfinite(float(metrics["loss_total"]))

    def flat(tree):
        return jax.tree_util.tree_leaves_with_path(tree)

    for (path, a), (_, b) in zip(flat(state.params["img_backbone"]),
                                 flat(s1.params["img_backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))
    for (path, a), (_, b) in zip(
            flat(dict(state.batch_stats)["img_backbone"]),
            flat(dict(s1.batch_stats)["img_backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))
    moved = [not np.allclose(np.asarray(a), np.asarray(b))
             for (_, a), (_, b) in zip(flat(state.params["img_neck"]),
                                       flat(s1.params["img_neck"]))]
    assert any(moved)


def test_train_step_lower_matches_train_step():
    """train_step_lower (the AOT path used by the multichip dryrun) must
    produce the same step as train_step, including for the dryrun's
    ResNet-10 backbone config (ADVICE r3: the AOT entry and depth=10 had
    no CPU coverage; a static-arg signature drift vs _train_step would
    otherwise only surface in the driver)."""
    rng = np.random.RandomState(0)
    grid = {"x": (-40.0, 40.0, 8.0), "y": (-40.0, 40.0, 8.0),
            "z": (-1.0, 5.4, 1.6), "depth": (2.0, 42.0, 4.0)}
    bf_grid = {"x": (-40.0, 40.0, 8.0), "y": (-40.0, 40.0, 8.0),
               "z": (-1.0, 5.4, 1.6)}
    C = 32
    model = FBOCC(grid_config=grid, bevformer_grid_config=bf_grid,
                  input_size=(32, 64), num_cams=2, history_cat_num=2,
                  single_bev_num_channels=C, depth_channels=10,
                  backbone_depth=10, img_feat_channels=64,
                  depth_mid_channels=32, max_queries_per_cam=64,
                  history_cat_conv_out_channels=2 * C,
                  voxel_channels=(8, 16, 32), voxel_out_channels=16)
    trainer = Trainer(model)
    intr = np.diag([200.0, 200.0, 1.0]).astype(np.float32)
    intr[0, 2], intr[1, 2] = 32.0, 16.0
    B, N = 1, 2
    batch = dict(
        imgs=jnp.asarray(rng.randn(B, N, 32, 64, 3).astype(np.float32)),
        rots=jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        trans=jnp.zeros((B, N, 3)),
        intrins=jnp.broadcast_to(jnp.asarray(intr), (B, N, 3, 3)),
        post_rots=jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        post_trans=jnp.zeros((B, N, 3)),
        bda=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        start_of_sequence=jnp.ones((B,), bool),
        sequence_group_idx=jnp.arange(B, dtype=jnp.int32),
        curr_to_prev_ego_rt=jnp.broadcast_to(jnp.eye(4), (B, 4, 4)),
        gt_occupancy=jnp.asarray(rng.randint(0, 19, size=(B, 20, 20, 8))),
        gt_depth=jnp.asarray(
            (rng.rand(B, N, 32, 64) * 40).astype(np.float32)),
    )
    tstate = init_temporal_state(B, (10, 10, 4), 2, C)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, tstate)

    s_ref, t_ref, m_ref = trainer.train_step(state, tstate, batch,
                                             do_history=True)
    compiled = trainer.train_step_lower(state, tstate, batch,
                                        do_history=True).compile()
    s_aot, t_aot, m_aot = compiled(state, tstate, batch)

    assert np.isfinite(float(m_ref["loss_total"]))
    np.testing.assert_allclose(float(m_aot["loss_total"]),
                               float(m_ref["loss_total"]), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s_ref.params),
            jax.tree_util.tree_leaves_with_path(s_aot.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=str(path))
