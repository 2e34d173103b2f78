from fbbev_tpu.parallel.mesh import (  # noqa: F401
    batch_pspecs, make_mesh, shard_batch, state_pspecs)
