#!/bin/bash
# Round-4 stage E: finish the entropy matrices ONE ROW PER PROCESS (the
# tunnel backend dies mid-run every ~2-3 rows of 2^28 work; incremental
# CSVs + per-row processes make every row durable), then merge.
cd /root/repo
LOG=benchmarks/results/roundfour_stage_e.log
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

# u32 keys 2^28: remaining rows
for e in 8 0 zipf; do
  T=2400 run python benchmarks/entropy_matrix.py -k 268435456 --types uint32 \
    --entropies $e --csv $R/em_r4_u32_2e28_e$e.csv
done

# u32 stable pairs 2^28: all rows
for e in 1 2 4 8 0 zipf; do
  T=2400 run python benchmarks/entropy_matrix.py -k 268435456 --types pairs \
    --stable --entropies $e --csv $R/em_r4_pairs_2e28_e$e.csv
done

# u64 / f64 keys at 2^26 (u64 may be done by stage B; rows are cheap)
for e in 1 2 4 8 0 zipf; do
  T=1800 run python benchmarks/entropy_matrix.py -k 67108864 --types uint64 \
    --entropies $e --csv $R/em_r4_u64_2e26_e$e.csv
done
for e in 1 2 4 8 0; do
  T=1800 run python benchmarks/entropy_matrix.py -k 67108864 --types float64 \
    --entropies $e --csv $R/em_r4_f64_2e26_e$e.csv
done
# u64 unstable pairs at 2^26
for e in 1 2 4 8 0; do
  T=1800 run python benchmarks/entropy_matrix.py -k 67108864 --types uint64 \
    --pairs --entropies $e --csv $R/em_r4_u64pairs_2e26_e$e.csv
done

# merge per-row CSVs into the final artifacts
python - <<'EOF'
import glob, os
R = "benchmarks/results"
def merge(pattern, out, keep=None):
    rows, header = [], None
    for f in sorted(glob.glob(os.path.join(R, pattern))):
        lines = [l.strip() for l in open(f) if l.strip()]
        if not lines:
            continue
        if header is None:
            header = lines[0]
        rows += [l for l in lines[1:] if (keep is None or keep in l)]
    if header:
        with open(os.path.join(R, out), "a") as fh:
            if os.path.getsize(os.path.join(R, out)) == 0 if os.path.exists(os.path.join(R, out)) else True:
                pass
        with open(os.path.join(R, out), "w") as fh:
            fh.write(header + "\n" + "\n".join(rows) + "\n")
        print(out, len(rows), "rows")
merge("em_r4_u32_2e28_e*.csv", "entropy_matrix_r4_u32_2e28_extra.csv")
merge("em_r4_pairs_2e28_e*.csv", "entropy_matrix_r4_pairs_2e28.csv")
merge("em_r4_u64_2e26_e*.csv", "entropy_matrix_r4_u64_2e26.csv")
merge("em_r4_f64_2e26_e*.csv", "entropy_matrix_r4_f64_2e26.csv")
merge("em_r4_u64pairs_2e26_e*.csv", "entropy_matrix_r4_u64pairs_2e26.csv")
EOF

echo "=== roundfour stage E complete $(date) ===" | tee -a "$LOG"
