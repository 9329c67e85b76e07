#!/bin/bash
# Round-5 stage A: the full 2^28 skew matrix (VERDICT r4 #4) + u64
# reconciliation rows (#7).  Rows are BATCHED per process (three entropy
# rows share one process: the tier/verify graphs compile once and rows
# 2-3 are compile-free; the driver's incremental CSV flush keeps each
# finished row durable across tunnel deaths), with health-poll recovery
# between batches and per-batch resume.
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

# run CSV ROWS CMD... — skip when CSV already has ROWS data rows
run() {
  csv="$1"; want="$2"; shift 2
  have=$(tail -n +2 "$csv" 2>/dev/null | grep -c .)
  have=${have:-0}
  if [ "$have" -ge "$want" ]; then
    echo "skip (has $have rows): $csv" | tee -a "$LOG"; return 0
  fi
  for attempt in 1 2 3; do
    health || return 1
    echo "=== $* (attempt $attempt) === $(date +%H:%M:%S)" | tee -a "$LOG"
    timeout "${T:-4200}" "$@" 2>&1 | grep -vE "WARNING|^I[0-9]" | tee -a "$LOG"
    rc="${PIPESTATUS[0]}"
    have=$(tail -n +2 "$csv" 2>/dev/null | grep -c .)
    have=${have:-0}
    [ "$rc" = 0 ] && return 0
    [ "$have" -ge "$want" ] && return 0
    echo "--- rc=$rc (rows=$have); retrying after health ---" | tee -a "$LOG"
  done
  return 1
}

# u32 keys 2^28 (the e1 row is already durable from the first launch)
run $R/em_r5_u32_2e28_a.csv 3 \
  python benchmarks/entropy_matrix.py -k 268435456 -r 2 --types uint32 \
    --entropies 1 2 4 --csv $R/em_r5_u32_2e28_a.csv
# skew rows: e0 (presorted short-circuit, safe) first; then a
# compile-only meminfo probe of the equidepth tier (the first e8 attempt
# died with "TPU backend error (Internal)" — diagnose OOM vs wedge
# before re-triggering), then the equidepth rows individually
run $R/em_r5_u32_2e28_b0.csv 1 \
  python benchmarks/entropy_matrix.py -k 268435456 -r 2 --types uint32 \
    --entropies 0 --csv $R/em_r5_u32_2e28_b0.csv
if [ ! -s $R/r5_eq28_meminfo.json ]; then
  health && timeout 2400 python benchmarks/eq28_meminfo.py --log2n 28 \
    > $R/r5_eq28_meminfo.json 2>>"$LOG" \
    && cat $R/r5_eq28_meminfo.json | tee -a "$LOG" \
    || echo "eq28 meminfo failed" | tee -a "$LOG"
fi
# (e8/zipf rows moved after the safe batches: their first attempts
# hit "TPU backend error (Internal)" and wedged the chip for ~40 min;
# they retry at the end with the uint32 tie-split fix)

# u32 unstable pairs 2^28 (MSB rdxsrt_unstable_sort_pairs parity rows)
run $R/em_r5_pairs_2e28_a.csv 3 \
  python benchmarks/entropy_matrix.py -k 268435456 -r 2 --types pairs \
    --entropies 1 2 4 --csv $R/em_r5_pairs_2e28_a.csv
run $R/em_r5_pairs_2e28_b.csv 3 \
  python benchmarks/entropy_matrix.py -k 268435456 -r 2 --types pairs \
    --entropies 8 0 zipf --csv $R/em_r5_pairs_2e28_b.csv

# u64 plane rows 2^26 (reconciliation: the r4 238-vs-348 M discrepancy
# was the host-tier tax; these rows ride the cached cond dispatch)
run $R/em_r5_u64_2e26_a.csv 6 \
  python benchmarks/entropy_matrix.py -k 67108864 -r 2 --types uint64 \
    --entropies 1 2 4 8 0 zipf --csv $R/em_r5_u64_2e26_a.csv

# u64 at 2^28, uniform (the README-table anchor row)
run $R/em_r5_u64_2e28_e1.csv 1 \
  python benchmarks/entropy_matrix.py -k 268435456 -r 2 --types uint64 \
    --entropies 1 --csv $R/em_r5_u64_2e28_e1.csv

run $R/em_r5_u32_2e28_b8.csv 1 \
  python benchmarks/entropy_matrix.py -k 268435456 -r 2 --types uint32 \
    --entropies 8 --csv $R/em_r5_u32_2e28_b8.csv
run $R/em_r5_u32_2e28_bz.csv 1 \
  python benchmarks/entropy_matrix.py -k 268435456 -r 2 --types uint32 \
    --entropies zipf --csv $R/em_r5_u32_2e28_bz.csv

# merge (the original per-row e1 file is included if present)
python - <<'EOF'
import glob
for pats, out in [
    (["benchmarks/results/em_r5_u32_2e28_e*.csv",
      "benchmarks/results/em_r5_u32_2e28_a.csv",
      "benchmarks/results/em_r5_u32_2e28_b*.csv"],
     "benchmarks/results/entropy_matrix_r5_u32_2e28.csv"),
    (["benchmarks/results/em_r5_pairs_2e28_*.csv"],
     "benchmarks/results/entropy_matrix_r5_pairs_2e28.csv"),
    (["benchmarks/results/em_r5_u64_2e26_a.csv"],
     "benchmarks/results/entropy_matrix_r5_u64_2e26.csv"),
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
            key = ",".join(ln.split(",")[:2])
            if key not in seen and ln.strip():
                seen.add(key)
                rows.append(ln)
    if header:
        open(out, "w").write("\n".join([header] + rows) + "\n")
        print(out, len(rows), "rows")
EOF
echo "stage A complete $(date)" | tee -a "$LOG"
