"""fbbev_tpu: a TPU-native (JAX/XLA/Pallas) re-implementation of the
FB-BEV / FB-OCC camera-only 3D perception framework.

This is NOT a port of the reference (NVlabs/FB-BEV, mmdet3d/CUDA); it is a
from-scratch framework designed for TPU hardware:

* compute path: JAX + XLA + Pallas kernels, bf16 on the MXU, static shapes
* scale-out: ``jax.sharding`` meshes (data x space axes), XLA collectives
* runtime: functional train step with explicit temporal-state carry,
  optax/orbax, host-side C++ helpers for index precomputation

Reference behaviours are cited as ``/root/reference/<file>:<line>`` in
docstrings so parity can be audited without copying code.
"""

__version__ = "0.1.0"

from fbbev_tpu.registry import Registry, build_from_cfg  # noqa: F401
