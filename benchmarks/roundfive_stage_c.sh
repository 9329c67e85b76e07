#!/bin/bash
# Round-5 stage C: prioritized re-drive after the mid-round tunnel wedge.
# Ordering is by r4-verdict value per chip-minute:
#   1. the crashed u32 2^28 skew rows (e8+zipf in ONE process so the
#      equi-depth tier graph compiles once) — VERDICT #4
#   2. pairs 2^28 entropy rows — VERDICT #2 evidence at headline size
#   3. u64 2^26 reconciliation rows — VERDICT #7
#   4. post-normalization shard profile with the sorted-window finish —
#      VERDICT #5
#   5. leftover stage A/B items as time allows
# Every step is durable (incremental CSV flush / atomic JSON move) and
# skipped when its artifact already exists, so re-running is free.
cd /root/repo
LOG=benchmarks/results/roundfive_stage_c.log
R=benchmarks/results

health() {
  for i in $(seq 1 200); do
    if timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
print('OK', np.asarray(jax.jit(lambda a:(a*2).sum())(jnp.arange(1024))))
" >/dev/null 2>&1; then return 0; fi
    echo "health attempt $i failed $(date +%H:%M:%S)" | tee -a "$LOG"
    sleep 120
  done
  return 1
}

# run_csv CSV ROWS CMD... — skip when CSV already has ROWS data rows
run_csv() {
  csv="$1"; want="$2"; shift 2
  have=$(tail -n +2 "$csv" 2>/dev/null | grep -c .)
  have=${have:-0}
  if [ "$have" -ge "$want" ]; then
    echo "skip (has $have rows): $csv" | tee -a "$LOG"; return 0
  fi
  for attempt in 1 2; do
    health || return 1
    echo "=== $* (attempt $attempt) === $(date +%H:%M:%S)" | tee -a "$LOG"
    timeout "${T:-3000}" "$@" 2>&1 | grep -vE "WARNING|^I[0-9]" | tee -a "$LOG"
    rc="${PIPESTATUS[0]}"
    have=$(tail -n +2 "$csv" 2>/dev/null | grep -c .)
    have=${have:-0}
    [ "$rc" = 0 ] && return 0
    [ "$have" -ge "$want" ] && return 0
    echo "--- rc=$rc (rows=$have); retrying after health ---" | tee -a "$LOG"
  done
  return 1
}

run_out() {
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

merge_csvs() {
python - <<'EOF'
import glob
for pats, out in [
    (["benchmarks/results/em_r5_u32_2e28_e*.csv",
      "benchmarks/results/em_r5_u32_2e28_a.csv",
      "benchmarks/results/em_r5_u32_2e28_b*.csv"],
     "benchmarks/results/entropy_matrix_r5_u32_2e28.csv"),
    (["benchmarks/results/em_r5_pairs_2e28_*.csv"],
     "benchmarks/results/entropy_matrix_r5_pairs_2e28.csv"),
    (["benchmarks/results/em_r5_u64_2e2*.csv"],
     "benchmarks/results/entropy_matrix_r5_u64.csv"),
]:
    rows, header, seen = [], None, set()
    files = []
    for p in pats:
        files += sorted(glob.glob(p))
    for f in files:
        lines = open(f).read().strip().splitlines()
        if not lines:
            continue
        header = lines[0]
        for ln in lines[1:]:
            key = ",".join(ln.split(",")[:3])
            if key not in seen and ln.strip():
                seen.add(key)
                rows.append(ln)
    if header:
        open(out, "w").write("\n".join([header] + rows) + "\n")
        print(out, len(rows), "rows")
EOF
}

# 1) the crashed skew rows, one process (equi-depth graph compiles once)
run_csv $R/em_r5_u32_2e28_b.csv 2 \
  python benchmarks/entropy_matrix.py -k 268435456 -r 2 --types uint32 \
    --entropies 8 zipf --csv $R/em_r5_u32_2e28_b.csv
merge_csvs | tee -a "$LOG"

# 2) pairs 2^28 entropy rows (unstable = MSB rdxsrt parity)
run_csv $R/em_r5_pairs_2e28_a.csv 3 \
  python benchmarks/entropy_matrix.py -k 268435456 -r 2 --types pairs \
    --entropies 1 2 4 --csv $R/em_r5_pairs_2e28_a.csv
merge_csvs | tee -a "$LOG"

# 3) u64 reconciliation rows at 2^26 (one process, all six entropies)
run_csv $R/em_r5_u64_2e26_a.csv 6 \
  python benchmarks/entropy_matrix.py -k 67108864 -r 2 --types uint64 \
    --entropies 1 2 4 8 0 zipf --csv $R/em_r5_u64_2e26_a.csv
merge_csvs | tee -a "$LOG"

# 4) post-normalization shard profile, sorted-window finish (VERDICT #5)
T=3600 run_out $R/r5_shard_profile_2e27.json \
  python benchmarks/shard_stage_profile.py --log2n-shard 27 --d 8 \
    --chunks 4 --capacity-factor 1.35 --finish both

# 5) leftovers in stage-A/B order
run_csv $R/em_r5_pairs_2e28_b.csv 3 \
  python benchmarks/entropy_matrix.py -k 268435456 -r 2 --types pairs \
    --entropies 8 0 zipf --csv $R/em_r5_pairs_2e28_b.csv
run_csv $R/em_r5_u64_2e28_e1.csv 1 \
  python benchmarks/entropy_matrix.py -k 268435456 -r 2 --types uint64 \
    --entropies 1 --csv $R/em_r5_u64_2e28_e1.csv
merge_csvs | tee -a "$LOG"

T=2400 run_out $R/r5_segmented_ragged_pairs.json \
  python benchmarks/segmented_bench.py --log2n 26 --seg 4096 --ragged --pairs
T=3000 run_out $R/r5_bench_pairs_2e28.json \
  python bench.py --pairs --verify
T=1500 run_out $R/r5_bench_keys_2e28.json \
  python bench.py --verify
T=3600 run_out $R/r5_shard_profile_pairs_2e26.json \
  python benchmarks/shard_stage_profile.py --log2n-shard 26 --d 8 \
    --chunks 4 --capacity-factor 1.35 --finish windows --pairs
T=2400 run_out $R/r5_segmented_uniform.json \
  python benchmarks/segmented_bench.py --log2n 26 --seg 4096
T=2400 run_out $R/r5_segmented_ragged.json \
  python benchmarks/segmented_bench.py --log2n 26 --seg 4096 --ragged

merge_csvs | tee -a "$LOG"
echo "stage C complete $(date)" | tee -a "$LOG"
