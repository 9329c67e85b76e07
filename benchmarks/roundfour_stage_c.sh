#!/bin/bash
# Round-4 stage C: on-chip A/B of the generalized column-major layout
# (S=512) + the fixed equidepth profiler + per-stage pipeline profile.
cd /root/repo
LOG=benchmarks/results/roundfour_stage_c.log

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

# headline with S=512 col-major (vs 863 M at S=128)
T=900 run python bench.py --verify
# stage decomposition at S=512 (vs net nb=2 111.19 ms at S=128)
T=1800 run python benchmarks/pass_decomp.py --log2n 28
# full per-stage pipeline (deferred-DMA collapse attribution)
T=1800 run python benchmarks/pipeline_profile.py 28
# equidepth attribution at 2^28 entropy-2 (fixed profiler, 2^22 sample)
T=2400 run python benchmarks/equidepth_profile.py --log2n 28 --entropy 2
# pairs headline at the (to-be-)pinned config
T=1200 run python bench.py --log2n 28 --pairs --verify

# pairs/u64 big-tile at 2^28: rerun with the block-local staged merge
# (the r3/r4 failures were whole-tile staged-leaf scoped-vmem OOMs)
T=2400 run python benchmarks/geometry_ab.py --log2n 28 --pairs --stable --configs big_pairs
T=2400 run python benchmarks/geometry_ab.py --log2n 28 --u64 --configs big
T=1800 run python benchmarks/geometry_ab.py --log2n 26 --u64 --configs base,big

echo "=== roundfour stage C complete $(date) ===" | tee -a "$LOG"

# re-run the shard-stage bound with the honest (range-normalized) finish
T=1800 run python benchmarks/shard_stage_profile.py --log2n-shard 25 --d 8 --chunks 4
T=2400 run python benchmarks/shard_stage_profile.py --log2n-shard 27 --d 8 --chunks 4
