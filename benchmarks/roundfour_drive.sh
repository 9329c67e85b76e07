#!/bin/bash
# Round-4 stage-A drive, self-healing: every command waits for device
# health and retries once after a wedge (the tunnel flaps; a one-shot
# upfront check kept aborting the whole drive).
cd /root/repo
LOG=benchmarks/results/roundfour_drive.log

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

# 1) headline + verify (XOR comparator + cascade tail + deferred-DMA
#    collapse all land here; old baseline 873 M keys/s)
T=900 run python bench.py --verify
T=900 run python bench.py --log2n 26 --verify

# 2) sorted/constant input short-circuit on chip
T=600 run python benchmarks/shortcircuit_check.py

# 3) XOR comparator A/B at the adopted geometry (old numbers in
#    r4_decomp_pass0.log: net nb=2 = 111.55 ms)
T=1500 run python benchmarks/pass_decomp.py --log2n 28
T=1500 run python benchmarks/pass_decomp.py --log2n 28 --merge

# 4) equidepth attribution at 2^28 entropy-2 (sample cap 2^22 now)
T=2400 run python benchmarks/equidepth_profile.py --log2n 28 --entropy 2

# 5) pairs big-tile A/B (no gather)
T=1800 run python benchmarks/geometry_ab.py --log2n 26 --pairs --stable --configs base,big_pairs
T=2400 run python benchmarks/geometry_ab.py --log2n 28 --pairs --stable --configs base,big_pairs

# 6) u64 big-tile repro (captures the real compile error now)
T=1800 run python benchmarks/geometry_ab.py --log2n 28 --u64 --configs big

# 7) distributed shard-stage profile with the chunked collapse
T=1800 run python benchmarks/shard_stage_profile.py --log2n-shard 25 --d 8 --chunks 4
T=2400 run python benchmarks/shard_stage_profile.py --log2n-shard 27 --d 8 --chunks 4

echo "=== roundfour stage A complete $(date) ===" | tee -a "$LOG"
