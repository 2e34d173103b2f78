#!/bin/bash
# Probe the TPU lease with a bounded matmul in a fresh process every 60s.
# Writes status lines to .tpu_probe.log; exits as soon as the chip answers.
for i in $(seq 1 120); do
  if timeout 90 python -c "
import time, numpy as np, jax.numpy as jnp
t0=time.time()
x = jnp.ones((1024,1024), jnp.bfloat16)
y = np.asarray(x @ x)
print('ok', round(time.time()-t0,1))
" >> /root/repo/.tpu_probe.log 2>&1; then
    echo "TPU HEALTHY at $(date -u +%H:%M:%S) (attempt $i)" >> /root/repo/.tpu_probe.log
    exit 0
  fi
  echo "attempt $i failed $(date -u +%H:%M:%S)" >> /root/repo/.tpu_probe.log
  sleep 60
done
exit 1
