"""Fused Pallas fuse_history (ring-slot) vs the XLA fallback (age-order).

The two paths keep different state REPRESENTATIONS (fixed ring slots vs
age-ordered channels) but must produce identical fused outputs at every
step of a stream -- the (age -> tensor) multiset invariant documented in
ops/pallas_fuse_warp.py.  Runs the kernel through the Pallas interpreter
on CPU (FBBEV_FORCE_FUSE_WARP=interpret).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fbbev_tpu.models.fbocc import FBOCC, init_temporal_state

B, T, C = 1, 2, 64
NY = NX = 30
NZ = 8

GRID = {"x": (-12.0, 12.0, 0.8), "y": (-12.0, 12.0, 0.8),
        "z": (-1.0, 5.4, 0.8), "depth": (2.0, 42.0, 2.0)}
BF_GRID = {"x": (-12.0, 12.0, 0.8), "y": (-12.0, 12.0, 0.8),
           "z": (-1.0, 5.4, 1.6)}


def _model():
    return FBOCC(grid_config=GRID, bevformer_grid_config=BF_GRID,
                 history_cat_num=T, single_bev_num_channels=C,
                 history_cat_conv_out_channels=2 * C)


def _flow(step):
    # step 0 (sequence start) is the identity -- the dataset contract
    # (data/nuscenes.py sets curr_to_prev_ego_rt = eye on starts)
    th = 0.03 * step
    c2p = np.eye(4, dtype=np.float32)
    c2p[0, 0] = c2p[1, 1] = np.cos(th)
    c2p[0, 1], c2p[1, 0] = -np.sin(th), np.sin(th)
    c2p[0, 3], c2p[1, 3] = 0.4 * step, -0.25 * min(step, 1)
    c2p[2, 3] = 0.1 * min(step, 1)
    return c2p


def _meta(step):
    return dict(
        start_of_sequence=jnp.asarray([step == 0]),
        sequence_group_idx=jnp.zeros((B,), jnp.int32),
        curr_to_prev_ego_rt=jnp.asarray(_flow(step))[None],
    )


def _params(model, rng):
    curr = jnp.asarray(rng.randn(B, NY, NX, NZ, C).astype(np.float32))
    tstate = init_temporal_state(B, (NX, NY, NZ), T, C)

    def init_run(mdl):
        return mdl.fuse_history(curr, tstate, _meta(0),
                                jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
                                do_history=True, train=False)

    return model.init(jax.random.PRNGKey(0), method=init_run)


def _stream(model, variables, currs, force_fused, epi=False):
    env_key = "FBBEV_FORCE_FUSE_WARP"
    epi_key = "FBBEV_FUSE_WARP_EPI"
    old = os.environ.get(env_key)
    old_epi = os.environ.get(epi_key)
    try:
        if force_fused:
            os.environ[env_key] = "interpret"
        else:
            os.environ.pop(env_key, None)
        # epi defaults ON since round 5 -- set "0" explicitly to get the
        # separate-time-conv kernel path
        os.environ[epi_key] = "1" if epi else "0"
        tstate = init_temporal_state(B, (NX, NY, NZ), T, C)
        outs = []
        for step, curr in enumerate(currs):
            def run(mdl):
                return mdl.fuse_history(
                    jnp.asarray(curr), tstate, _meta(step),
                    jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
                    do_history=True, train=False)

            fused, tstate, mism = model.apply(variables, method=run)
            assert not bool(np.asarray(mism).any())
            outs.append(np.asarray(fused))
        return outs, tstate
    finally:
        if old is None:
            os.environ.pop(env_key, None)
        else:
            os.environ[env_key] = old
        if old_epi is None:
            os.environ.pop(epi_key, None)
        else:
            os.environ[epi_key] = old_epi



def test_ring_path_matches_age_path():
    rng = np.random.RandomState(0)
    model = _model()
    variables = _params(model, rng)
    # randomise BN stats so the eval-mode affine is non-trivial
    bs = jax.tree.map(
        lambda x: jnp.asarray(
            rng.rand(*x.shape).astype(np.float32) * 0.5 + 0.5),
        variables.get("batch_stats", {}))
    variables = {"params": variables["params"], "batch_stats": bs}

    # steps beyond T exercise the ring wrap-around (oldest-slot reuse)
    currs = [rng.randn(B, NY, NX, NZ, C).astype(np.float32) * 0.3
             for _ in range(T + 3)]
    ref, ref_state = _stream(model, variables, currs, force_fused=False)
    got, got_state = _stream(model, variables, currs, force_fused=True)

    for step, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            g, r, atol=2e-4, rtol=2e-3,
            err_msg=f"fused output diverged at stream step {step}")
    # state representations differ (ring vs age order) but the stored
    # frame multisets must match: compare channel-block sets per position
    rh = np.asarray(ref_state.history_bev).reshape(B, NZ, NY, NX, T, C)
    gh = np.asarray(got_state.history_bev).reshape(B, NZ, NY, NX, T, C)
    r_sorted = np.sort(rh, axis=4)
    g_sorted = np.sort(gh, axis=4)
    np.testing.assert_allclose(g_sorted, r_sorted, atol=2e-4, rtol=2e-3)



def test_epilogue_fused_matches_age_path():
    """FBBEV_FUSE_WARP_EPI=1: the in-kernel time-conv (folded eval BN) +
    cat-conv epilogue must reproduce the XLA fallback's fused output and
    carry the same history multiset, across ring wrap-around."""
    rng = np.random.RandomState(2)
    model = _model()
    variables = _params(model, rng)
    bs = jax.tree.map(
        lambda x: jnp.asarray(
            rng.rand(*x.shape).astype(np.float32) * 0.5 + 0.5),
        variables.get("batch_stats", {}))
    variables = {"params": variables["params"], "batch_stats": bs}

    currs = [rng.randn(B, NY, NX, NZ, C).astype(np.float32) * 0.3
             for _ in range(T + 3)]
    ref, ref_state = _stream(model, variables, currs, force_fused=False)
    got, got_state = _stream(model, variables, currs, force_fused=True,
                             epi=True)

    for step, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            g, r, atol=3e-4, rtol=3e-3,
            err_msg=f"epilogue-fused output diverged at step {step}")
    rh = np.asarray(ref_state.history_bev).reshape(B, NZ, NY, NX, T, C)
    gh = np.asarray(got_state.history_bev).reshape(B, NZ, NY, NX, T, C)
    np.testing.assert_allclose(np.sort(gh, axis=4), np.sort(rh, axis=4),
                               atol=2e-4, rtol=2e-3)


def test_epilogue_fused_ncb2_block_indexing():
    """NCB=2 (two channel blocks per warp step): the per-block bias rows
    and cat-conv row blocks are indexed by the channel-block grid dim; the
    flagship runs NCB=2 and the round-5 on-chip lowering failure
    (/tmp/ab_r5a.jsonl) was in exactly this path while the NCB=1 test
    above passed.  T=8/C=64/f32 forces CB=256 -> NCB=2 (see
    _channel_block); 3 stream steps cover k>0 accumulation without the
    interpreter cost of a full ring wrap."""
    rng = np.random.RandomState(3)
    T8 = 8
    model = FBOCC(grid_config=GRID, bevformer_grid_config=BF_GRID,
                  history_cat_num=T8, single_bev_num_channels=C,
                  history_cat_conv_out_channels=2 * C)
    curr0 = jnp.asarray(rng.randn(B, NY, NX, NZ, C).astype(np.float32))
    tstate0 = init_temporal_state(B, (NX, NY, NZ), T8, C)

    def init_run(mdl):
        return mdl.fuse_history(curr0, tstate0, _meta(0),
                                jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
                                do_history=True, train=False)

    variables = model.init(jax.random.PRNGKey(0), method=init_run)
    bs = jax.tree.map(
        lambda x: jnp.asarray(
            rng.rand(*x.shape).astype(np.float32) * 0.5 + 0.5),
        variables.get("batch_stats", {}))
    variables = {"params": variables["params"], "batch_stats": bs}

    from fbbev_tpu.ops.pallas_fuse_warp import _channel_block
    assert _channel_block(T8 * C, C, 4, NZ) == 2 * C * 2, (
        "test premise: expected NCB=2")

    currs = [rng.randn(B, NY, NX, NZ, C).astype(np.float32) * 0.3
             for _ in range(3)]

    def stream(force_fused, epi):
        env_key = "FBBEV_FORCE_FUSE_WARP"
        epi_key = "FBBEV_FUSE_WARP_EPI"
        old, old_epi = os.environ.get(env_key), os.environ.get(epi_key)
        try:
            if force_fused:
                os.environ[env_key] = "interpret"
            else:
                os.environ.pop(env_key, None)
            os.environ[epi_key] = "1" if epi else "0"
            tstate = init_temporal_state(B, (NX, NY, NZ), T8, C)
            outs = []
            for step, curr in enumerate(currs):
                def run(mdl):
                    return mdl.fuse_history(
                        jnp.asarray(curr), tstate, _meta(step),
                        jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
                        do_history=True, train=False)

                fused, tstate, mism = model.apply(variables, method=run)
                assert not bool(np.asarray(mism).any())
                outs.append(np.asarray(fused))
            return outs
        finally:
            for k, v in ((env_key, old), (epi_key, old_epi)):
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    ref = stream(False, False)
    got = stream(True, True)
    for step, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            g, r, atol=3e-4, rtol=3e-3,
            err_msg=f"NCB=2 epilogue diverged at step {step}")


def test_ring_start_reset_mid_stream():
    """A start-of-sequence flag mid-stream must reset the fused path's
    ring exactly like the fallback's tile-reset."""
    rng = np.random.RandomState(1)
    model = _model()
    variables = _params(model, rng)

    currs = [rng.randn(B, NY, NX, NZ, C).astype(np.float32) * 0.3
             for _ in range(4)]
    metas = [_meta(0), _meta(1), _meta(0), _meta(1)]  # reset at step 2

    def stream(force):
        env_key = "FBBEV_FORCE_FUSE_WARP"
        old = os.environ.get(env_key)
        try:
            if force:
                os.environ[env_key] = "interpret"
            else:
                os.environ.pop(env_key, None)
            tstate = init_temporal_state(B, (NX, NY, NZ), T, C)
            outs = []
            for curr, meta in zip(currs, metas):
                def run(mdl):
                    return mdl.fuse_history(
                        jnp.asarray(curr), tstate, meta,
                        jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
                        do_history=True, train=False)

                fused, tstate, _ = model.apply(variables, method=run)
                outs.append(np.asarray(fused))
            return outs
        finally:
            if old is None:
                os.environ.pop(env_key, None)
            else:
                os.environ[env_key] = old

    ref = stream(False)
    got = stream(True)
    for step, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(g, r, atol=2e-4, rtol=2e-3,
                                   err_msg=f"step {step}")


def test_fused_kernel_actually_engages():
    """Regression (round 5): fbocc.fuse_history called supports() without
    the frame width C, so every config with single_bev_num_channels != 80
    (including THIS file's C=64) silently took the XLA fallback -- all the
    stream-equivalence tests above were vacuously comparing the fallback
    to itself.  Spy on the kernel entry point and assert both the plain
    and the epilogue (default) paths really run it."""
    from fbbev_tpu.ops import pallas_fuse_warp as pfw

    assert pfw.supports((B, NZ, NY, NX, T * C), C=C, itemsize=4)

    calls = {"n": 0, "epi": 0}
    orig = pfw.fuse_warp

    def spy(*a, **k):
        calls["n"] += 1
        if k.get("epilogue") is not None:
            calls["epi"] += 1
        return orig(*a, **k)

    rng = np.random.RandomState(3)
    model = _model()
    variables = _params(model, rng)
    currs = [rng.randn(B, NY, NX, NZ, C).astype(np.float32)]
    pfw.fuse_warp = spy
    try:
        _stream(model, variables, currs, force_fused=True, epi=False)
        assert calls["n"] >= 1 and calls["epi"] == 0
        _stream(model, variables, currs, force_fused=True, epi=True)
        assert calls["epi"] >= 1
    finally:
        pfw.fuse_warp = orig
