#!/bin/bash
# Poll the tunneled TPU forever; each time it recovers, (re)run the stage-D
# queue.  Exits only when stage D completes (its final echo line lands).
cd /root/repo
DONE_MARK="roundthree stage D complete"
for i in $(seq 1 400); do
  if grep -q "$DONE_MARK" benchmarks/results/roundthree_stage_d.log 2>/dev/null; then
    echo "stage D already complete"; exit 0
  fi
  if timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
print('OK', np.asarray(jax.jit(lambda a: (a*2).sum())(jnp.arange(1024))))
" > /tmp/tpu_health.log 2>&1; then
    echo "RECOVERED at $(date) (attempt $i) — running stage D"
    bash benchmarks/roundthree_stage_d.sh && exit 0
    echo "stage D died at $(date); resuming poll"
  else
    echo "attempt $i failed at $(date)"
  fi
  sleep 120
done
echo "never recovered"
exit 1
