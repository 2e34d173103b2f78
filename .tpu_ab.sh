#!/bin/bash
# Serialized on-chip A/B sequence (run from repo root after a health probe).
# Each step is a fresh bounded subprocess; a wedged step must NOT be
# followed by more TPU work (the chip lease can wedge for a long time --
# CLAUDE.md).  Usage: bash .tpu_ab.sh [upto_step]
set -u
LOG=/tmp/tpu_ab.log
upto=${1:-9}
step() {
  n=$1; shift; name=$1; shift
  [ "$n" -gt "$upto" ] && return 0
  echo "=== step $n: $name $(date +%H:%M:%S) ===" | tee -a $LOG
  timeout 700 "$@" >> $LOG 2>&1
  rc=$?
  echo "--- step $n rc=$rc ---" | tee -a $LOG
  if [ $rc -ne 0 ]; then
    echo "step $n FAILED (rc=$rc); probing chip health" | tee -a $LOG
    timeout 60 python -u -c "import numpy as np, jax, jax.numpy as jnp; x=jnp.ones((256,256)); print('chip ok', float(np.asarray(x@x).sum()))" >> $LOG 2>&1 || { echo "CHIP WEDGED after step $n -- stopping" | tee -a $LOG; exit 1; }
  fi
}
# 1. health probe
step 1 probe python -u -c "import numpy as np, jax, jax.numpy as jnp; x=jnp.ones((256,256)); print('chip ok', float(np.asarray(x@x).sum()))"
# 2. baseline bench: per-frame dispatch (the known-good round-2 config)
step 2 bench-perframe python -u bench.py
# 3. streaming-scan bench (isolates the lax.scan pipeline change)
step 3 bench-stream env FBBEV_BENCH_STREAM=1 python -u bench.py
# 4. fused fuse_history kernel 3-frame parity/timing check
step 4 fuse-check env FBBEV_FUSE_WARP=1 python -u .check_fuse.py fused
# 5. bench with the fused kernel + streaming
step 5 bench-fused env FBBEV_FUSE_WARP=1 FBBEV_BENCH_STREAM=1 python -u bench.py
# 6. zfold conv + occfuse composition probe
step 6 zfold-occfuse env FBBEV_CONV3D=zfold FBBEV_OCCFUSE=1 FBBEV_DISABLE_FUSE_WARP=1 python -u .check_fuse.py fallback
# 7. serving pipeline (host-precomputed ranks) throughput
step 7 serving-bench python -u -c "
import numpy as np, jax.numpy as jnp
from fbbev_tpu import geometry
from fbbev_tpu.models import FBOCC
from fbbev_tpu.serving import FixedRigPipeline
import jax
model = FBOCC(dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
intr = np.diag([560.,560.,1.]).astype(np.float32); intr[0,2],intr[1,2]=352.,128.
angles = np.linspace(0, 2*np.pi, 6, endpoint=False)
rots = np.stack([geometry.rot_z(a) for a in angles])[None].astype(np.float32)
post_rot = (np.eye(3)*0.44 + np.diag([0.,0.,0.56])).astype(np.float32)
cam = geometry.CamParams(rots=jnp.asarray(rots), trans=jnp.zeros((1,6,3)),
    intrins=jnp.broadcast_to(jnp.asarray(intr),(1,6,3,3)),
    post_rots=jnp.broadcast_to(jnp.asarray(post_rot),(1,6,3,3)),
    post_trans=jnp.zeros((1,6,3)), bda=jnp.broadcast_to(jnp.eye(3),(1,3,3)))
state = None
from fbbev_tpu.models.fbocc import init_temporal_state
batch0 = None
variables = jax.jit(model.init)(jax.random.PRNGKey(0),
    dict(imgs=jnp.zeros((1,6,256,704,3)), rots=cam.rots, trans=cam.trans,
         intrins=cam.intrins, post_rots=cam.post_rots, post_trans=cam.post_trans,
         bda=cam.bda, start_of_sequence=jnp.ones((1,),bool),
         sequence_group_idx=jnp.zeros((1,),jnp.int32),
         curr_to_prev_ego_rt=jnp.broadcast_to(jnp.eye(4),(1,4,4))),
    init_temporal_state(1,(100,100,8),16,80, dtype=jnp.bfloat16))
from fbbev_tpu.utils.fuse_bn import fold_batch_norms
variables = jax.tree.map(jnp.asarray, fold_batch_norms(variables))
pipe = FixedRigPipeline(model, variables, cam)
fps = pipe.benchmark(iters=30)
print({'serving_fps_per_chip': round(fps,2)})
"
echo "AB sequence done" | tee -a $LOG
