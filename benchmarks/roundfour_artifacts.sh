#!/bin/bash
# Round-4 stage-B: the reference-scale test-matrix artifacts (VERDICT #8)
# + 2^30 verified run (#6) + multichip/pairs/u64 rows with the configs
# pinned after stage A.  Every command is wrapped with a TPU health
# retry: the r3 mid-matrix "TPU backend error (Internal)" is the tunnel/
# device wedging (reproduced in r4 as a dead compile service), so each
# step waits for device health and retries once after a wedge.
cd /root/repo
LOG=benchmarks/results/roundfour_artifacts.log

health() {
  for i in $(seq 1 100); do
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

# entropy matrices (one CSV per dtype family, rows verified)
T=4800 run python benchmarks/entropy_matrix.py -k 268435456 --types uint32 \
  --csv benchmarks/results/entropy_matrix_r4_u32_2e28.csv
T=3600 run python benchmarks/entropy_matrix.py -k 268435456 --types uint32 --pairs --stable \
  --csv benchmarks/results/entropy_matrix_r4_pairs_2e28.csv
T=3600 run python benchmarks/entropy_matrix.py -k 67108864 --types uint64 \
  --csv benchmarks/results/entropy_matrix_r4_u64_2e26.csv
T=3600 run python benchmarks/entropy_matrix.py -k 67108864 --types float64 \
  --csv benchmarks/results/entropy_matrix_r4_f64_2e26.csv
T=3600 run python benchmarks/entropy_matrix.py -k 67108864 --types uint64 --pairs \
  --csv benchmarks/results/entropy_matrix_r4_u64pairs_2e26.csv

# 2^30: meminfo, run, verified run (checks-only verify graph now)
T=1800 run python bench.py --log2n 30 --meminfo
T=2400 run python bench.py --log2n 30 --verify

# headline snapshot
T=900 run python bench.py --verify

# reference-parity driver rows + supporting artifacts
T=1500 run python benchmarks/driver_lsb.py
T=2400 run python benchmarks/size_sweep.py
T=1800 run python benchmarks/skew_bench.py
T=1500 run python benchmarks/segmented_bench.py
T=1200 run python bench.py --log2n 29 --verify

echo "=== roundfour artifacts complete $(date) ===" | tee -a "$LOG"
