#!/bin/bash
# Round-3 stage C: on-chip geometry + pairs-gather A/B (run AFTER
# roundthree_drive.sh).  Decides the per-(key,value) tuning-table rows
# (VERDICT r2 #1/#3/#6/#7).  Appends to the geo log.
cd /root/repo
LOG=benchmarks/results/roundthree_geo.log
run() {
  echo "=== $* === $(date +%H:%M:%S)" | tee -a "$LOG"
  timeout "${T:-1200}" "$@" 2>&1 | grep -vE "WARNING|^I[0-9]" | tee -a "$LOG"
  return "${PIPESTATUS[0]}"
}

T=120 run python -c "import jax,jax.numpy as jnp,numpy as np; print('TPU OK', np.asarray(jax.jit(lambda a:(a*2).sum())(jnp.arange(1024))))" || exit 1

# 0) retry the keys headline verify row (timed out at T=900 in stage B)
T=2400 run python bench.py --log2n 28 --verify

# 1) keys-only geometry at the flagship size
T=1800 run python benchmarks/geometry_ab.py --log2n 28 --configs base,big
T=1800 run python benchmarks/geometry_ab.py --log2n 28 --configs big_nb2,big_r64
# winner sanity across sizes
T=1500 run python benchmarks/geometry_ab.py --log2n 26 --configs base,big
T=1500 run python benchmarks/geometry_ab.py --log2n 24 --configs base,big
T=1800 run python benchmarks/geometry_ab.py --log2n 29 --configs base,big

# 2) stable pairs: gather-apply vs payload-riding, both geometries
T=1800 run python benchmarks/geometry_ab.py --log2n 26 --pairs --stable --configs base,gather
T=1800 run python benchmarks/geometry_ab.py --log2n 26 --pairs --stable --configs big_pairs,big_gather
T=1800 run python benchmarks/geometry_ab.py --log2n 28 --pairs --stable --configs base,gather,big_gather

# 3) u64 keys
T=1800 run python benchmarks/geometry_ab.py --log2n 26 --u64 --configs base,big
T=1800 run python benchmarks/geometry_ab.py --log2n 28 --u64 --configs base,big

# 4) u64 stable pairs: composite 3-plane + gather vs general sortkey path
T=1800 run python benchmarks/geometry_ab.py --log2n 26 --u64 --pairs --stable --configs base,gather,big_gather

# 5) distributed shard-stage bound on the real chip (VERDICT r2 #9):
#    2^28 over 8 chips (shard 2^25) and 2^32 over 16 (shard 2^28)
T=1200 run python benchmarks/shard_stage_profile.py --log2n-shard 25 --d 8 --chunks 4
T=1200 run python benchmarks/shard_stage_profile.py --log2n-shard 25 --d 8 --chunks 4 --pairs
T=1800 run python benchmarks/shard_stage_profile.py --log2n-shard 28 --d 16 --chunks 4

echo "=== roundthree geo A/B complete $(date) ===" | tee -a "$LOG"
