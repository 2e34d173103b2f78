"""Serving-path equivalence: FixedRigPipeline (host-precomputed voxel
ranks, the analogue of the reference's TRT deploy precompute,
``fbocc_trt.py:36-76``) must produce the SAME per-frame occupancy argmax
as the plain per-frame ``model.apply`` inference path.

This pins the deploy benchmark path: bench.py measures the serving
pipeline, so any divergence between it and the model path would silently
invalidate both the benchmark and deployment parity claims.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbbev_tpu import geometry
from fbbev_tpu.models import FBOCC
from fbbev_tpu.models.fbocc import init_temporal_state
from fbbev_tpu.serving import FixedRigPipeline

from tests.test_train import TINY_BEVFORMER_GRID, TINY_GRID, tiny_batch


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(3)
    model = FBOCC(grid_config=TINY_GRID,
                  bevformer_grid_config=TINY_BEVFORMER_GRID,
                  input_size=(64, 176), num_cams=2, history_cat_num=2,
                  voxel_channels=(16, 32, 64), voxel_out_channels=32)
    batch = tiny_batch(rng, B=1, N=2, with_gt=False)
    state = init_temporal_state(1, (25, 25, 8), 2, 80)
    variables = model.init(jax.random.PRNGKey(0), batch, state)
    return model, variables, batch, state, rng


def test_fixed_rig_matches_model_apply(setup):
    model, variables, batch, state0, rng = setup
    cam = geometry.CamParams(
        rots=batch["rots"], trans=batch["trans"],
        intrins=batch["intrins"], post_rots=batch["post_rots"],
        post_trans=batch["post_trans"], bda=batch["bda"])
    pipe = FixedRigPipeline(model, variables, cam, use_host_ranks=True)

    frames = [np.asarray(batch["imgs"])] + [
        rng.randn(1, 2, 64, 176, 3).astype(np.float32) for _ in range(2)]
    rts = [np.eye(4, dtype=np.float32)[None]]
    for _ in range(2):
        rt = np.eye(4, dtype=np.float32)
        rt[:3, 3] = rng.randn(3) * 0.02
        rts.append(rt[None])

    # reference path: per-frame model.apply
    state = state0
    model_preds = []
    for i, (im, rt) in enumerate(zip(frames, rts)):
        b = dict(batch)
        b["imgs"] = jnp.asarray(im)
        b["start_of_sequence"] = jnp.full((1,), i == 0, bool)
        b["curr_to_prev_ego_rt"] = jnp.asarray(rt)
        outputs, state = model.apply(variables, b, state, train=False)
        model_preds.append(np.asarray(outputs["occ_logits"].argmax(-1)))

    # serving path: host ranks + streaming pipeline
    for i, (im, rt) in enumerate(zip(frames, rts)):
        pred = np.asarray(pipe(im, i == 0, rt))
        # logits near argmax ties can flip with reduction order; require
        # near-total agreement plus exact agreement on frame 0 (identical
        # op order except the pool's precomputed-rank segment order)
        agree = (pred == model_preds[i]).mean()
        assert agree > 0.999, (i, agree)


def test_fixed_rig_pallas_pool_matches(setup, monkeypatch):
    """The Pallas sorted-slab pool (FBBEV_POOL=pallas) must reproduce the
    XLA segment-sum serving path (run via the Pallas interpreter here;
    Mosaic-compiled on TPU)."""
    model, variables, batch, state0, rng = setup
    # NR = fH*fW must be lane-aligned for the kernel tables: use a 128-wide
    # input so fW = 8 (the flagship's 704 is already a multiple of 8)
    from fbbev_tpu.models import FBOCC
    from tests.test_train import TINY_BEVFORMER_GRID, TINY_GRID
    model = FBOCC(grid_config=TINY_GRID,
                  bevformer_grid_config=TINY_BEVFORMER_GRID,
                  input_size=(64, 128), num_cams=2, history_cat_num=2,
                  voxel_channels=(16, 32, 64), voxel_out_channels=32)
    b = dict(batch)
    b["imgs"] = jnp.asarray(
        rng.randn(1, 2, 64, 128, 3).astype(np.float32))
    state = init_temporal_state(1, (25, 25, 8), 2, 80)
    variables = model.init(jax.random.PRNGKey(1), b, state)
    cam = geometry.CamParams(
        rots=b["rots"], trans=b["trans"], intrins=b["intrins"],
        post_rots=b["post_rots"], post_trans=b["post_trans"],
        bda=b["bda"])

    imgs = np.asarray(b["imgs"])
    ref_pipe = FixedRigPipeline(model, variables, cam)
    ref = np.asarray(ref_pipe(imgs, True))

    monkeypatch.setenv("FBBEV_POOL", "pallas")
    monkeypatch.setenv("FBBEV_FORCE_POOL", "interpret")
    pipe = FixedRigPipeline(model, variables, cam)
    assert pipe.pool_plan is not None
    out = np.asarray(pipe(imgs, True))
    assert (out == ref).mean() > 0.999


def test_host_ranks_match_device_ranks(setup):
    """The C++ host rank precompute must equal the on-device rank math."""
    model, variables, batch, state0, _ = setup
    cam = geometry.CamParams(
        rots=batch["rots"], trans=batch["trans"],
        intrins=batch["intrins"], post_rots=batch["post_rots"],
        post_trans=batch["post_trans"], bda=batch["bda"])
    pipe = FixedRigPipeline(model, variables, cam, use_host_ranks=True)
    fp = model.make_forward_projection()
    coor = geometry.frustum_to_ego(jnp.asarray(fp.frustum), cam)
    nx, ny, nz = (int(g) for g in fp.nx)
    ci, valid = geometry.voxel_coords(
        coor, jnp.asarray(fp.grid_lower, jnp.float32),
        jnp.asarray(fp.grid_interval, jnp.float32), (nx, ny, nz))
    P = coor.size // 3
    rank = (ci[..., 2] * (ny * nx) + ci[..., 1] * nx
            + ci[..., 0]).reshape(P)
    device_ranks = np.where(np.asarray(valid).reshape(P),
                            np.asarray(rank), nz * ny * nx)
    np.testing.assert_array_equal(np.asarray(pipe.ranks_bev), device_ranks)
