#!/bin/bash
# Round-3 stage D: the remaining on-chip queue after the tunnel outage cut
# stage C at step 1.  Front-loaded by verdict value: pairs gather A/B
# (VERDICT #3), u64 rows (#6/#7), entropy-matrix artifacts (#5), the 2^30
# memory diagnosis (#4), shard-stage bounds (#9).  Appends to its own log;
# every step is incremental so a tunnel death keeps finished rows.
cd /root/repo
LOG=benchmarks/results/roundthree_stage_d.log
run() {
  echo "=== $* === $(date +%H:%M:%S)" | tee -a "$LOG"
  timeout "${T:-1500}" "$@" 2>&1 | grep -vE "WARNING|^I[0-9]" | tee -a "$LOG"
  return "${PIPESTATUS[0]}"
}

T=120 run python -c "import jax,jax.numpy as jnp,numpy as np; print('TPU OK', np.asarray(jax.jit(lambda a:(a*2).sum())(jnp.arange(1024))))" || exit 1

# 1) stable pairs: gather-apply vs payload-riding (VERDICT #3: >=300 M/s)
T=1800 run python benchmarks/geometry_ab.py --log2n 26 --pairs --stable --configs base,gather,big_gather
T=2400 run python benchmarks/geometry_ab.py --log2n 28 --pairs --stable --configs base,gather,big_gather

# 2) u64 keys (VERDICT #6: >=400 M/s at 2^26)
T=1800 run python benchmarks/geometry_ab.py --log2n 26 --u64 --configs base,big,big_nb2
T=1800 run python benchmarks/geometry_ab.py --log2n 28 --u64 --configs base,big

# 3) u64 stable pairs: composite 3-plane + gather vs general path
T=1800 run python benchmarks/geometry_ab.py --log2n 26 --u64 --pairs --stable --configs base,gather,big_gather

# 4) entropy matrix artifacts (VERDICT #5) — u32 at the flagship size,
#    u64/pairs at 2^26 (2^28 u64 tier-chain OOMs; artifact > aspiration)
T=3000 run python benchmarks/entropy_matrix.py -k 268435456 --types uint32 --csv benchmarks/results/entropy_matrix_r3_u32_2e28.csv
T=3000 run python benchmarks/entropy_matrix.py -k 67108864 --types uint64 --pairs --csv benchmarks/results/entropy_matrix_r3_u64pairs_2e26.csv

# 5) 2^30: compiler memory analysis, then the attempt (VERDICT #4)
T=1200 run python bench.py --log2n 30 --meminfo
T=1800 run python bench.py --log2n 30
T=1800 run python bench.py --log2n 30 --verify

# 6) distributed shard-stage bound on the real chip (VERDICT #9)
T=1500 run python benchmarks/shard_stage_profile.py --log2n-shard 25 --d 8 --chunks 4
T=1500 run python benchmarks/shard_stage_profile.py --log2n-shard 25 --d 8 --chunks 4 --pairs
T=1800 run python benchmarks/shard_stage_profile.py --log2n-shard 28 --d 16 --chunks 4

echo "=== roundthree stage D complete $(date) ===" | tee -a "$LOG"
