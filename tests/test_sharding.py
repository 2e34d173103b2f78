"""Multi-chip sharding validation on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fbbev_tpu.models.fbocc import init_temporal_state
from fbbev_tpu.parallel import make_mesh, shard_batch, state_pspecs
from fbbev_tpu.train import Trainer

from tests.test_train import TINY_BEVFORMER_GRID, TINY_GRID, tiny_batch, tiny_model


def test_mesh_shapes():
    mesh = make_mesh(data=4, space=2)
    assert mesh.shape == {"data": 4, "space": 2}
    mesh1 = make_mesh(space=2)
    assert mesh1.shape == {"data": 4, "space": 2}


def test_sharded_train_step():
    assert len(jax.devices()) == 8
    rng = np.random.RandomState(0)
    mesh = make_mesh(data=4, space=2)
    model = tiny_model()
    trainer = Trainer(model)
    B, N = 4, 2
    batch = tiny_batch(rng, B=B, N=N)
    tstate = init_temporal_state(B, (25, 25, 8), 2, 80)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, tstate)

    with mesh:
        batch_sh = shard_batch(batch, mesh)
        tstate_sh = jax.device_put(
            tstate, jax.tree.map(
                lambda spec: NamedSharding(mesh, spec),
                state_pspecs(tstate)))
        state_sh = jax.device_put(state, NamedSharding(mesh, P()))
        new_state, new_tstate, metrics = trainer.train_step(
            state_sh, tstate_sh, batch_sh, do_history=True)
        for k, v in metrics.items():
            assert np.isfinite(np.asarray(v)).all(), k

    # matches the unsharded step numerically (same global batch)
    new_state_ref, _, metrics_ref = trainer.train_step(
        state, tstate, batch, do_history=True)
    np.testing.assert_allclose(
        float(metrics["loss_total"]), float(metrics_ref["loss_total"]),
        rtol=2e-4)
