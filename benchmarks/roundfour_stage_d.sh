#!/bin/bash
# Round-4 stage D (post S=256 + vmem-ceiling): pairs/u64 big-tile at
# 2^28, equidepth attribution, pipeline profile, honest shard bound,
# pairs headline.
cd /root/repo
LOG=benchmarks/results/roundfour_stage_d.log

health() {
  for i in $(seq 1 200); do
    if timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
print('OK', np.asarray(jax.jit(lambda a:(a*2).sum())(jnp.arange(1024))))
" >/dev/null 2>&1; then return 0; fi
    echo "health attempt $i failed $(date +%H:%M:%S)" | tee -a "$LOG"
    sleep 180
  done
  return 1
}

run() {
  for attempt in 1 2; do
    health || return 1
    echo "=== $* (attempt $attempt) === $(date +%H:%M:%S)" | tee -a "$LOG"
    timeout "${T:-1500}" "$@" 2>&1 | grep -vE "WARNING|^I[0-9]" | tee -a "$LOG"
    rc="${PIPESTATUS[0]}"
    [ "$rc" = 0 ] && return 0
    echo "--- rc=$rc; retrying after health ---" | tee -a "$LOG"
  done
  return 1
}

# 1) pairs/u64 big-tile 2^28 (previously scoped-vmem OOM)
T=2400 run python benchmarks/geometry_ab.py --log2n 28 --pairs --stable --configs base,big_pairs
T=2400 run python benchmarks/geometry_ab.py --log2n 28 --u64 --configs base,big
T=1800 run python benchmarks/geometry_ab.py --log2n 26 --u64 --configs base,big

# 2) equidepth attribution (2^22 sample cap)
T=2400 run python benchmarks/equidepth_profile.py --log2n 28 --entropy 2

# 3) per-stage pipeline at S=256
T=1800 run python benchmarks/pipeline_profile.py 28

# 4) honest shard bound (range-normalized finish)
T=1800 run python benchmarks/shard_stage_profile.py --log2n-shard 25 --d 8 --chunks 4
T=2400 run python benchmarks/shard_stage_profile.py --log2n-shard 27 --d 8 --chunks 4

echo "=== roundfour stage D complete $(date) ===" | tee -a "$LOG"
