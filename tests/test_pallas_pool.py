"""Pallas fixed-rig voxel pool (ops/pallas_pool.py) vs the XLA
segment-sum path, via the Pallas interpreter (the kernel itself is
compiled by Mosaic on TPU, exercised by serving/bench)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fbbev_tpu.ops.bev_pool import lss_voxel_pool_precomputed
from fbbev_tpu.ops.pallas_pool import (
    PoolPlan, lss_voxel_pool_planned, plan_pool, supports)


def _random_ranks(rng, B, N, D, fH, fW, grid_size, valid_frac=0.6):
    nx, ny, nz = grid_size
    P = B * N * D * fH * fW
    num_voxels = B * nx * ny * nz
    per_sample = nx * ny * nz
    batch_of = np.arange(P) // (P // B)
    local = rng.randint(0, per_sample, size=P)
    ranks = batch_of * per_sample + local
    invalid = rng.rand(P) > valid_frac
    return np.where(invalid, num_voxels, ranks).astype(np.int32)


@pytest.mark.parametrize("B,N,K,R", [(1, 2, 64, 64), (2, 3, 32, 128)])
def test_planned_pool_matches_segment_sum(rng, B, N, K, R):
    D, fH, fW = 5, 4, 8
    grid_size = (12, 10, 4)
    ranks = _random_ranks(rng, B, N, D, fH, fW, grid_size)
    depth = rng.rand(B, N, D, fH, fW).astype(np.float32)
    feat = rng.randn(B, N, fH, fW, 24).astype(np.float32)

    ref = lss_voxel_pool_precomputed(
        jnp.asarray(ranks), jnp.asarray(depth), jnp.asarray(feat),
        grid_size)

    plan = plan_pool(ranks, B, N, D, fH, fW, grid_size, K=K, R=R)
    out = lss_voxel_pool_planned(plan, jnp.asarray(depth),
                                 jnp.asarray(feat), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_plan_block_invariants(rng):
    B, N, D, fH, fW = 1, 2, 5, 4, 8
    grid_size = (12, 10, 4)
    K, R = 16, 32
    ranks = _random_ranks(rng, B, N, D, fH, fW, grid_size)
    plan = plan_pool(ranks, B, N, D, fH, fW, grid_size, K=K, R=R)
    assert isinstance(plan, PoolPlan)
    # every valid point appears exactly once
    n_valid = int((ranks < B * 12 * 10 * 4).sum())
    assert int((plan.pix >= 0).sum()) == n_valid
    # local voxel offsets stay inside the window
    assert plan.lvox.min() >= 0 and plan.lvox.max() < R
    # block windows are consistent with member ranks
    assert plan.win.max() < plan.num_windows
    assert supports(16, 44, 80, 80)  # flagship shapes fit VMEM


def test_empty_rig(rng):
    B, N, D, fH, fW = 1, 1, 2, 4, 8
    grid_size = (4, 4, 2)
    num_voxels = 4 * 4 * 2
    ranks = np.full(B * N * D * fH * fW, num_voxels, np.int32)  # all dump
    plan = plan_pool(ranks, B, N, D, fH, fW, grid_size, K=8, R=16)
    depth = rng.rand(B, N, D, fH, fW).astype(np.float32)
    feat = rng.randn(B, N, fH, fW, 8).astype(np.float32)
    out = lss_voxel_pool_planned(plan, jnp.asarray(depth),
                                 jnp.asarray(feat), interpret=True)
    assert np.asarray(out).max() == 0.0
