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
echo "AB sequence done" | tee -a $LOG
