#!/bin/bash
# Round-5 stage B: on-chip profiles for the r5 features —
#   * sorted-window vs collapse distributed finish (VERDICT #5/#6)
#   * segmented ragged pairs measured number (VERDICT #8)
#   * stable/unstable pairs at 2^28 (VERDICT #2 evidence at headline size)
#   * headline bench re-verify
# Health-polled, one measurement process per step, durable JSON lines.
cd /root/repo
LOG=benchmarks/results/roundfive_stage_b.log
R=benchmarks/results

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
  out="$1"; shift
  [ -s "$out" ] && { echo "skip (exists): $out" | tee -a "$LOG"; return 0; }
  for attempt in 1 2; do
    health || return 1
    echo "=== $* -> $out (attempt $attempt) === $(date +%H:%M:%S)" | tee -a "$LOG"
    timeout "${T:-2400}" "$@" > "$out.tmp" 2>>"$LOG"
    rc=$?
    if [ "$rc" = 0 ]; then mv "$out.tmp" "$out"; cat "$out" | tee -a "$LOG"; return 0; fi
    echo "--- rc=$rc; retrying after health ---" | tee -a "$LOG"
  done
  return 1
}

# 1) distributed finish A/B at production shard geometry (2^27/shard, d=8)
T=3600 run $R/r5_shard_profile_2e27.json \
  python benchmarks/shard_stage_profile.py --log2n-shard 27 --d 8 \
    --chunks 4 --capacity-factor 1.35 --finish both

# 2) pairs variant of the shard profile (2^26/shard keeps compile time sane)
T=3600 run $R/r5_shard_profile_pairs_2e26.json \
  python benchmarks/shard_stage_profile.py --log2n-shard 26 --d 8 \
    --chunks 4 --capacity-factor 1.35 --finish windows --pairs

# 3) segmented: uniform + ragged + ragged pairs (stable & unstable) at 2^26
T=2400 run $R/r5_segmented_uniform.json \
  python benchmarks/segmented_bench.py --log2n 26 --seg 4096
T=2400 run $R/r5_segmented_ragged.json \
  python benchmarks/segmented_bench.py --log2n 26 --seg 4096 --ragged
T=2400 run $R/r5_segmented_ragged_pairs.json \
  python benchmarks/segmented_bench.py --log2n 26 --seg 4096 --ragged --pairs
T=2400 run $R/r5_segmented_ragged_pairs_stable.json \
  python benchmarks/segmented_bench.py --log2n 26 --seg 4096 --ragged --pairs --stable

# 4) pairs at 2^28 through the headline driver (stable + unstable, verified)
T=3000 run $R/r5_bench_pairs_2e28.json \
  python bench.py --pairs --verify
T=3000 run $R/r5_bench_pairs_unstable_2e28.json \
  python bench.py --pairs --unstable --verify

# 5) headline keys re-verify (the driver runs its own at round end; this
#    is the committed artifact)
T=1500 run $R/r5_bench_keys_2e28.json \
  python bench.py --verify

# 6) at-scale checkpoints: 2^29 and 2^30 verified (flag-mode path)
T=3000 run $R/r5_bench_keys_2e29.json \
  python bench.py --log2n 29 --verify
T=3600 run $R/r5_bench_keys_2e30.json \
  python bench.py --log2n 30 --verify

echo "stage B complete $(date)" | tee -a "$LOG"
