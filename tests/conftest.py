"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# cache path keyed by host CPU features so entries written by a
# different machine (e.g. the remote avx512 compile service) can never
# be loaded here -- see __graft_entry__._host_cpu_fingerprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _host_cpu_fingerprint  # noqa: E402

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    f"/tmp/fbbev_xla_cache_local_{_host_cpu_fingerprint()}")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax  # noqa: E402

# The axon TPU plugin can override JAX_PLATFORMS; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.RandomState(0)
