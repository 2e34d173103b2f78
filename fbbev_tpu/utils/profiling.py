"""Profiling / cost-analysis helpers.

Replaces the reference's ad-hoc tooling (SURVEY.md section 5): the cuda-
synced ``run_time`` decorator (``models/fbbev/utils/bricks.py:32-47``)
becomes a host-transfer-synced timer (``block_until_ready`` is unreliable
on the axon tunnel); ``tools/analysis_tools/get_flops.py`` becomes XLA's
own cost analysis of the jitted function.
"""

from __future__ import annotations

import functools
import time
from collections import defaultdict
from typing import Any, Callable, Dict

import numpy as np

_STATS: Dict[str, list] = defaultdict(list)


def _sync(x):
    import jax
    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(jax.numpy.ravel(leaves[0])[:1])
    return x


def run_time(name: str):
    """Decorator printing a running mean of device-synced wall time."""

    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            t0 = time.perf_counter()
            out = _sync(fn(*args, **kwargs))
            dt = time.perf_counter() - t0
            _STATS[name].append(dt)
            times = _STATS[name]
            print(f"[run_time] {name}: {dt * 1e3:.2f} ms "
                  f"(mean {np.mean(times) * 1e3:.2f} over {len(times)})")
            return out

        return wrapped

    return deco


def flops_estimate(fn: Callable, *example_args, **kwargs) -> Dict[str, Any]:
    """Compile ``fn`` and return XLA's cost analysis (flops, bytes)."""
    import jax

    lowered = jax.jit(fn).lower(*example_args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {
        "flops": cost.get("flops"),
        "bytes_accessed": cost.get("bytes accessed"),
        "raw": dict(cost),
    }
