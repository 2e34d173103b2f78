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


# ---------------------------------------------------------------------------
# Active mesh: sharding hints inside model code.
#
# XLA's sharding propagation (GSPMD) loses the batch sharding at ops whose
# batch dimension is folded away or routed through scatter/sort/gather --
# measured on the full train step: the LSS pool's flattened segment-sum and
# the occ losses' batch-flattened sort each force an all-gather, after which
# EVERYTHING downstream (temporal fusion, 3D encoder, occupancy head, the
# whole loss backward) runs fully replicated on every device (28.7 GFLOP/dev
# vs the 2.2 ideal at the dryrun size).  The reference never hits this class
# of bug because DDP replicates by construction
# (``/root/reference/mmdet3d/apis/train.py:229-233``); a sharded single
# program must instead pin the batch axis at stage boundaries.
#
# Model code calls :func:`pshard` at those boundaries.  It is a no-op unless
# a mesh has been activated via :func:`use_mesh` (the train/eval loops and
# the multichip dryrun do), so single-device paths are untouched.
# ---------------------------------------------------------------------------

_ACTIVE_MESH: Optional[Mesh] = None


class use_mesh:
    """Context manager: activates ``mesh`` for :func:`pshard` hints AND
    enters it as the jax mesh context.  Functions jitted under this context
    must be (re)traced under it -- the train/eval loops enter it before
    their first step and stay inside for the run."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def __enter__(self):
        global _ACTIVE_MESH
        self._prev = _ACTIVE_MESH
        _ACTIVE_MESH = self.mesh
        if self.mesh is not None:
            self.mesh.__enter__()
        return self.mesh

    def __exit__(self, *exc):
        global _ACTIVE_MESH
        _ACTIVE_MESH = self._prev
        if self.mesh is not None:
            return self.mesh.__exit__(*exc)
        return False


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def pshard(x, *spec):
    """``with_sharding_constraint`` against the active mesh (no-op without
    one).  Default spec: batch dimension -> 'data', rest unsharded."""
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    if not spec:
        spec = ("data",)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


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
    """Shard a host batch onto the mesh.

    Single-process: a plain ``device_put``.  Multi-host (the reference's
    16-GPU DDP regime, ``apis/train.py:229-233``): each process holds its
    *local* slice of the global batch (the sampler deals per-process scene
    streams) and the global array is assembled across processes.
    """
    specs = batch_pspecs(batch)
    if jax.process_count() == 1:
        return {
            k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in batch.items()
        }
    return {
        k: jax.make_array_from_process_local_data(
            NamedSharding(mesh, specs[k]), np.asarray(v))
        for k, v in batch.items()
    }


def shard_temporal_state(tstate, mesh: Mesh):
    """Place a (host-built) TemporalState onto the mesh, batch-sharded."""
    specs = state_pspecs(tstate)
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
            tstate, specs)
    return jax.tree.map(
        lambda x, spec: jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x)),
        tstate, specs)


def replicate(tree, mesh: Mesh):
    if jax.process_count() == 1:
        return jax.device_put(tree, NamedSharding(mesh, P()))
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(
        tree, mesh, P())


def gather_to_host(tree):
    """Bring (possibly multi-host sharded) step outputs back to every host
    as numpy -- the TPU-native replacement for the reference's tmpdir-pickle
    eval gather (``/root/reference/mmdet3d/apis/test.py:210-256``)."""
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental import multihost_utils
    return jax.tree.map(np.asarray,
                        multihost_utils.process_allgather(tree, tiled=True))


def distributed_init_if_needed(multihost: bool = False) -> None:
    """``jax.distributed.initialize`` for multi-host runs (idempotent).

    The reference initialises NCCL process groups via
    ``init_dist`` (``/root/reference/tools/train.py:173``); on TPU pods the
    runtime handles ICI/DCN once the coordinator handshake is done.
    """
    if not multihost:
        return
    import jax.distributed as jd
    try:
        jd.initialize()
    except RuntimeError:
        pass  # already initialised
