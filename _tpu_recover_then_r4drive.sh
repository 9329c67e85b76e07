#!/bin/bash
# Poll the tunneled TPU; on recovery, run the round-4 stage-A drive.
cd /root/repo
for i in $(seq 1 200); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
print('OK', np.asarray(jax.jit(lambda a: (a*2).sum())(jnp.arange(1024))))
" > /tmp/tpu_health.log 2>&1; then
    echo "RECOVERED at $(date) (attempt $i)"
    bash benchmarks/roundfour_drive.sh
    exit 0
  fi
  echo "attempt $i failed at $(date)"
  sleep 180
done
echo "never recovered"
exit 1
