from fbbev_tpu.parallel.mesh import (  # noqa: F401
    active_mesh, batch_pspecs, distributed_init_if_needed, gather_to_host,
    make_mesh, pshard, replicate, shard_batch, shard_temporal_state,
    state_pspecs, use_mesh)
