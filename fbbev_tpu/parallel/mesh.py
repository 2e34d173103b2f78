"""Device-mesh scale-out.

The reference scales by NCCL data parallelism only (DDP, SyncBN,
``/root/reference/mmdet3d/apis/train.py:229-233``; SURVEY.md section 2.5).
The TPU-native design is a single program jitted over a 2-D mesh:

* ``data`` axis -- batch sharding (DP).  Losses/grads reduce over it via
  XLA's automatic collectives; BatchNorm statistics are *global-batch* by
  construction under jit, which reproduces SyncBN exactly.
* ``space`` axis -- intra-sample model parallelism: the 6-camera axis is
  sharded across ``space`` through the image encoder / depth net (camera
  parallelism), and XLA re-shards at the voxel-pool boundary where the
  cameras reduce into one BEV grid.

Parameters stay replicated (the model is ~68M params; ICI all-gathers of
activations dominate, not weights).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, space: int = 1,
              devices=None) -> Mesh:
    """Create a ('data', 'space') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // space
    assert data * space == n, (data, space, n)
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, ("data", "space"))


# Per-field partition specs for an FBOCC batch: batch dim -> data,
# camera dim -> space (where present).
_BATCH_SPECS = {
    "imgs": P("data", "space"),
    "rots": P("data", "space"),
    "trans": P("data", "space"),
    "intrins": P("data", "space"),
    "post_rots": P("data", "space"),
    "post_trans": P("data", "space"),
    "bda": P("data"),
    "start_of_sequence": P("data"),
    "sequence_group_idx": P("data"),
    "curr_to_prev_ego_rt": P("data"),
    "gt_occupancy": P("data"),
    "gt_depth": P("data", "space"),
}


def batch_pspecs(batch: Dict) -> Dict:
    return {k: _BATCH_SPECS.get(k, P("data")) for k in batch}


def state_pspecs(temporal_state) -> "type(temporal_state)":
    """TemporalState shards on its batch dimension."""
    return type(temporal_state)(
        history_bev=P("data"),
        sweep_time=P("data"),
        seq_ids=P("data"),
        forward_augs=P("data"),
    )


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    specs = batch_pspecs(batch)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in batch.items()
    }


def replicate(tree, mesh: Mesh):
    return jax.device_put(
        tree, NamedSharding(mesh, P()))
