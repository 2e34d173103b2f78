"""User-style drive of the serving surface with the fused occ-tail
(interpret mode on CPU): labels with FBBEV_OCC_TAIL=1 must match the
default path on the same FixedRigPipeline."""
import os

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fbbev_tpu import geometry  # noqa: E402
from fbbev_tpu.models import FBOCC  # noqa: E402
from fbbev_tpu.models.fbocc import init_temporal_state  # noqa: E402
from fbbev_tpu.serving import FixedRigPipeline  # noqa: E402
from tests.test_train import (TINY_BEVFORMER_GRID, TINY_GRID,  # noqa: E402
                              tiny_batch)

rng = np.random.RandomState(3)
model = FBOCC(grid_config=TINY_GRID,
              bevformer_grid_config=TINY_BEVFORMER_GRID,
              input_size=(64, 176), num_cams=2, history_cat_num=2,
              voxel_channels=(16, 32, 64), voxel_out_channels=32)
batch = tiny_batch(rng, B=1, N=2, with_gt=False)
state = init_temporal_state(1, (25, 25, 8), 2, 80)
variables = model.init(jax.random.PRNGKey(0), batch, state)
cam = geometry.CamParams(
    rots=batch["rots"], trans=batch["trans"],
    intrins=batch["intrins"], post_rots=batch["post_rots"],
    post_trans=batch["post_trans"], bda=batch["bda"])
frames = [np.asarray(batch["imgs"])] + [
    rng.randn(1, 2, 64, 176, 3).astype(np.float32) for _ in range(2)]


def run():
    pipe = FixedRigPipeline(model, variables, cam, use_host_ranks=True)
    return [np.asarray(pipe(f, i == 0)) for i, f in enumerate(frames)]


ref = run()
os.environ["FBBEV_OCC_TAIL"] = "1"
os.environ["FBBEV_FORCE_OCC_TAIL"] = "interpret"
tail = run()
for i, (a, b) in enumerate(zip(ref, tail)):
    agree = (a == b).mean()
    print(f"frame {i}: label agreement {agree:.6f}", a.shape, a.dtype)
    assert agree >= 0.999, agree
print("serving occ-tail drive OK")
