#!/bin/bash
# Round-5 stage A: the full 2^28 skew matrix (VERDICT r4 #4) + u64
# reconciliation rows (#7), one row per process (the tunnel backend dies
# every ~2-3 rows of 2^28 work; incremental CSVs + per-row processes make
# every row durable), with health-poll recovery between rows.
cd /root/repo
LOG=benchmarks/results/roundfive_stage_a.log
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
  for attempt in 1 2; do
    health || return 1
    echo "=== $* (attempt $attempt) === $(date +%H:%M:%S)" | tee -a "$LOG"
    timeout "${T:-2400}" "$@" 2>&1 | grep -vE "WARNING|^I[0-9]" | tee -a "$LOG"
    rc="${PIPESTATUS[0]}"
    [ "$rc" = 0 ] && return 0
    echo "--- rc=$rc; retrying after health ---" | tee -a "$LOG"
  done
  return 1
}

# u32 keys 2^28: the full entropy ladder through the r5 eager flow
for e in 1 2 4 8 0 zipf; do
  [ -s "$R/em_r5_u32_2e28_e$e.csv" ] && continue
  T=2400 run python benchmarks/entropy_matrix.py -k 268435456 -r 2 \
    --types uint32 --entropies $e --csv $R/em_r5_u32_2e28_e$e.csv
done

# u32 unstable pairs 2^28 (MSB rdxsrt_unstable_sort_pairs parity rows)
for e in 1 2 4 8 0 zipf; do
  [ -s "$R/em_r5_pairs_2e28_e$e.csv" ] && continue
  T=2400 run python benchmarks/entropy_matrix.py -k 268435456 -r 2 \
    --types pairs --entropies $e --csv $R/em_r5_pairs_2e28_e$e.csv
done

# u64 plane rows 2^26 (reconciliation: the r4 238-vs-348 M discrepancy was
# the host-tier tax; these rows now ride the cached cond dispatch)
for e in 1 2 4 8 0 zipf; do
  [ -s "$R/em_r5_u64_2e26_e$e.csv" ] && continue
  T=1800 run python benchmarks/entropy_matrix.py -k 67108864 -r 2 \
    --types uint64 --entropies $e --csv $R/em_r5_u64_2e26_e$e.csv
done

# u64 at 2^28, uniform (the README-table anchor row)
[ -s "$R/em_r5_u64_2e28_e1.csv" ] || \
  T=3000 run python benchmarks/entropy_matrix.py -k 268435456 -r 2 \
    --types uint64 --entropies 1 --csv $R/em_r5_u64_2e28_e1.csv

# merge
python - <<'EOF'
import glob
for pat, out in [
    ("benchmarks/results/em_r5_u32_2e28_e*.csv",
     "benchmarks/results/entropy_matrix_r5_u32_2e28.csv"),
    ("benchmarks/results/em_r5_pairs_2e28_e*.csv",
     "benchmarks/results/entropy_matrix_r5_pairs_2e28.csv"),
    ("benchmarks/results/em_r5_u64_2e26_e*.csv",
     "benchmarks/results/entropy_matrix_r5_u64_2e26.csv"),
]:
    rows, header = [], None
    for f in sorted(glob.glob(pat)):
        lines = open(f).read().strip().splitlines()
        if not lines:
            continue
        header = lines[0]
        rows += lines[1:]
    if header:
        open(out, "w").write("\n".join([header] + rows) + "\n")
        print(out, len(rows), "rows")
EOF
echo "stage A complete $(date)" | tee -a "$LOG"
