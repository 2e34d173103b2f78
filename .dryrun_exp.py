"""Timing experiment for dryrun_multichip redesign (run from repo root).

Usage: python .dryrun_exp.py [preset]
Env: DRY_SPACE=1|2, DRY_OPT0=1 adds --xla_backend_optimization_level=0
"""
import os
import sys
import time

n = 8
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if not f.startswith("--xla_force_host_platform_device_count")]
flags.append(f"--xla_force_host_platform_device_count={n}")
if os.environ.get("DRY_OPT0"):
    flags.append("--xla_backend_optimization_level=0")
os.environ["XLA_FLAGS"] = " ".join(flags)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("FBBEV_DISABLE_CONV_DECOMP", "zslab,pointwise,deconv")

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fbbev_tpu.models import FBOCC  # noqa: E402
from fbbev_tpu.models.fbocc import init_temporal_state  # noqa: E402
from fbbev_tpu.parallel import make_mesh, shard_batch, state_pspecs  # noqa: E402
from fbbev_tpu.train import Trainer  # noqa: E402
from fbbev_tpu.train.trainer import TrainState  # noqa: E402
from __graft_entry__ import _make_batch  # noqa: E402

t0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - t0:7.1f}s] {msg}", flush=True)


preset = sys.argv[1] if len(sys.argv) > 1 else "tiny"

space = int(os.environ.get("DRY_SPACE", "2"))
devices = jax.devices()[:n]
mesh = make_mesh(data=n // space, space=space, devices=devices)
log(f"mesh {dict(mesh.shape)}")

if preset == "r2":  # what round 2 shipped
    grid = {"x": (-40.0, 40.0, 4.0), "y": (-40.0, 40.0, 4.0),
            "z": (-1.0, 5.4, 1.6), "depth": (2.0, 42.0, 2.0)}
    C = 32
    kw = dict(input_size=(32, 96), num_cams=2, history_cat_num=2,
              single_bev_num_channels=C, depth_channels=20,
              backbone_depth=18, img_feat_channels=64,
              max_queries_per_cam=128,
              history_cat_conv_out_channels=2 * C,
              voxel_channels=(8, 16, 32), voxel_out_channels=16)
    occ_shape, hist_grid = (40, 40, 8), (20, 20, 4)
    H, W, ncam = 32, 96, 2
elif preset == "tiny":
    grid = {"x": (-8.0, 8.0, 2.0), "y": (-8.0, 8.0, 2.0),
            "z": (-1.0, 5.4, 1.6), "depth": (2.0, 10.0, 2.0)}
    C = 16
    kw = dict(input_size=(16, 48), num_cams=2, history_cat_num=2,
              single_bev_num_channels=C, depth_channels=4,
              backbone_depth=18, img_feat_channels=32,
              max_queries_per_cam=64,
              history_cat_conv_out_channels=2 * C,
              voxel_channels=(8, 16), voxel_out_channels=8)
    occ_shape, hist_grid = (16, 16, 8), (8, 8, 4)
    H, W, ncam = 16, 48, 2
else:
    raise SystemExit(f"unknown preset {preset}")

grid.setdefault("depth", (2.0, 10.0, 2.0))
bf_grid = {k: grid[k] for k in ("x", "y", "z")}
model = FBOCC(grid_config=grid, bevformer_grid_config=bf_grid, **kw)
trainer = Trainer(model)

B = mesh.shape["data"]
batch = _make_batch(B, ncam, H, W, with_gt=True, occ_shape=occ_shape)
tstate = init_temporal_state(B, hist_grid, 2, C)
log("building init")
variables = model.init(jax.random.PRNGKey(0), batch, tstate)
params = variables["params"]
bs = variables.get("batch_stats", {})
train_state = TrainState(
    step=jnp.zeros((), jnp.int32), params=params, batch_stats=bs,
    opt_state=trainer.optimizer.init(params),
    ema_params=jax.tree.map(jnp.copy, params),
    ema_batch_stats=jax.tree.map(jnp.copy, bs),
    ema_updates=jnp.zeros((), jnp.float32))
nparam = sum(x.size for x in jax.tree.leaves(params))
log(f"init done ({nparam} params)")

with mesh:
    batch_sh = shard_batch(batch, mesh)
    tstate_sh = jax.device_put(
        tstate, jax.tree.map(lambda s: NamedSharding(mesh, s),
                             state_pspecs(tstate)))
    train_state_sh = jax.device_put(train_state, NamedSharding(mesh, P()))
    log("inputs sharded; lowering")
    fn = trainer._train_step_fn if hasattr(trainer, "_train_step_fn") else None
    # go through the public API but split compile from execute via AOT
    import functools
    jitted = trainer.train_step_jit if hasattr(trainer, "train_step_jit") \
        else None
    # fall back: call train_step once; it jits internally
    log("compile+execute fused (trainer.train_step)")
    new_state, new_tstate, metrics = trainer.train_step(
        train_state_sh, tstate_sh, batch_sh, do_history=True)
    log("dispatched; blocking")
    loss = float(metrics["loss_total"])
log(f"loss={loss:.4f} ok")
