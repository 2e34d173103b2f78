"""Capture an XLA op-level profile of the full FB-OCC forward on TPU and
aggregate per-fusion device times from the perfetto trace."""
import glob
import gzip
import json
import os
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from fbbev_tpu.models import FBOCC
from fbbev_tpu.models.fbocc import init_temporal_state
from fbbev_tpu import geometry


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0])


rng = np.random.RandomState(0)
B, N = 1, 6
intr = np.diag([560., 560., 1.]).astype(np.float32)
intr[0, 2] = 352.
intr[1, 2] = 128.
rots = np.stack([geometry.rot_z(a) for a in np.linspace(
    0, 2 * np.pi, N, endpoint=False)])[None]
batch = dict(
    imgs=jnp.asarray(rng.randn(B, N, 256, 704, 3).astype(np.float32)),
    rots=jnp.asarray(np.broadcast_to(rots, (B, N, 3, 3)).astype(np.float32)),
    trans=jnp.zeros((B, N, 3)),
    intrins=jnp.broadcast_to(jnp.asarray(intr), (B, N, 3, 3)),
    post_rots=jnp.broadcast_to(jnp.asarray(
        (np.eye(3) * 0.44 + np.diag([0, 0, .56])).astype(np.float32)),
        (B, N, 3, 3)),
    post_trans=jnp.zeros((B, N, 3)),
    bda=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
    start_of_sequence=jnp.zeros((B,), bool),
    sequence_group_idx=jnp.zeros((B,), jnp.int32),
    curr_to_prev_ego_rt=jnp.broadcast_to(jnp.eye(4), (B, 4, 4)))
model = FBOCC(dtype=jnp.bfloat16)
tstate = init_temporal_state(B, (100, 100, 8), 16, 80)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch, tstate)


@jax.jit
def fwd(v, b, ts):
    return model.apply(v, b, ts, train=False, do_history=True)


out = fwd(variables, batch, tstate)
sync(out)

trace_dir = "/tmp/jaxtrace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        out = fwd(variables, batch, tstate)
    sync(out)

# parse perfetto trace
files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
if not files:
    sys.exit("no trace produced")
with gzip.open(files[0], "rt") as f:
    data = json.load(f)
events = data.get("traceEvents", [])
# find device-side lanes (TPU op events have 'dur' and pid/tid on device tracks)
pid_names = {e["pid"]: e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name"}
print("processes:", pid_names)
agg = {}
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pid_names.get(e.get("pid"), "")
    if "TPU" not in pname and "/device" not in pname.lower():
        continue
    name = e.get("name", "?")
    dur = e.get("dur", 0) / 1e3  # us -> ms
    agg[name] = agg.get(name, 0.0) + dur
    total += dur
top = sorted(agg.items(), key=lambda kv: -kv[1])[:60]
print(f"total device time (3 iters): {total:.2f} ms")
for name, dur in top:
    print(f"{dur/3:9.3f} ms  {name[:120]}")
