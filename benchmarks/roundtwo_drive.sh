#!/bin/bash
# Round-2 on-chip measurement sequence. Run from /root/repo when the TPU
# recovers; each step is a separate small compile unit under timeout so a
# wedged remote-compile service cannot eat the session. Appends to
# benchmarks/results/roundtwo_drive.log.
#
# Ordered by value-per-minute in case the tunnel dies again: headline
# benches first, then the gather A/Bs (decide the stable-pairs config
# flip), then the architecture-decision probe battery.
cd /root/repo
LOG=benchmarks/results/roundtwo_drive.log
run() {
  echo "=== $* === $(date +%H:%M:%S)" | tee -a "$LOG"
  timeout "${T:-420}" "$@" 2>&1 | grep -vE "WARNING|^I[0-9]" | tee -a "$LOG"
  # the function's status must be the COMMAND's, not tee's, so the step-0
  # recovery gate's `|| exit 1` actually fires on a dead tunnel
  return "${PIPESTATUS[0]}"
}

# 0) recovery check
T=120 run python -c "import jax,jax.numpy as jnp,numpy as np; print('TPU OK', np.asarray(jax.jit(lambda a:(a*2).sum())(jnp.arange(1024))))" || exit 1

# 1) headline + ceilings (the round's recorded metric)
T=900 run python bench.py --log2n 28 --verify
T=900 run python bench.py --log2n 26 --pairs --verify
T=900 run python bench.py --log2n 26 --pairs --gather --verify
T=900 run python bench.py --log2n 26 --pairs --unstable
T=900 run python bench.py --log2n 29
T=1200 run python bench.py --log2n 30 --verify

# 2) stable-pairs / u64 gather A/B (decides SortConfig.use_gather_pass)
T=600 run python benchmarks/stage_probe.py pass_gather --log2n 22 --check
T=600 run python benchmarks/stage_probe.py pass_stable --log2n 26
T=600 run python benchmarks/stage_probe.py pass_gather --log2n 26
T=600 run python benchmarks/stage_probe.py pass_gather --log2n 26 --values 2
T=600 run python benchmarks/stage_probe.py pass_stable --log2n 26 --planes 2 --values 0
T=600 run python benchmarks/stage_probe.py pass_gather --log2n 26 --planes 2 --values 0
T=600 run python benchmarks/stage_probe.py leaf_gather --log2n 22 --check
T=600 run python benchmarks/stage_probe.py leaf_multi --log2n 26
T=600 run python benchmarks/stage_probe.py leaf_gather --log2n 26

# 2b) u16-subtile sortkey pass (keys-only headline candidate) vs the raw
#     pass_full baseline (section 5); --check validates on-chip lowering
T=600 run python benchmarks/stage_probe.py pass_u16 --log2n 22 --values 0 --check
T=600 run python benchmarks/stage_probe.py pass_u16 --log2n 26 --values 0 --r 16
T=600 run python benchmarks/stage_probe.py pass_u16 --log2n 26 --values 0 --r 32
T=600 run python benchmarks/stage_probe.py pass_u16 --log2n 26 --values 1 --r 32
T=900 run python bench.py --log2n 28 --u16 --verify

# 3) architecture-decision probes (cheap, decisive)
run python benchmarks/stage_probe.py gather
run python benchmarks/stage_probe.py dynstore --check
run python benchmarks/stage_probe.py thin_mm --w 2
run python benchmarks/stage_probe.py thin_mm --w 8
run python benchmarks/stage_probe.py thin_mm --w 128
run python benchmarks/stage_probe.py batch_mm --w 2
run python benchmarks/stage_probe.py batch_mm --w 8
run python benchmarks/stage_probe.py rowperm_mm --check
run python benchmarks/stage_probe.py rankdest --r 16
run python benchmarks/stage_probe.py rankdest --r 32
run python benchmarks/stage_probe.py matmul --dtype bf16
run python benchmarks/stage_probe.py matmul --dtype s8
run python benchmarks/stage_probe.py matmul --dtype f32

# 4) 16-bit network rate: if u16 compare-exchange runs ~2x, a compact
#    u16 (digit|idx) sortkey + gather-apply path undercuts the u32 floor
T=600 run python benchmarks/stage_probe.py network --log2n 26 --dtype u16
T=600 run python benchmarks/stage_probe.py network --log2n 26 --dtype u32

# 5) starts variants (r=128 enabler) + pass-level variants
run python benchmarks/stage_probe.py starts --r 32
run python benchmarks/stage_probe.py starts_rows --r 32
run python benchmarks/stage_probe.py starts --r 128
run python benchmarks/stage_probe.py starts_rows --r 128
T=600 run python benchmarks/stage_probe.py pass_full --log2n 26 --r 32
T=600 run python benchmarks/stage_probe.py pass_full --log2n 26 --r 32 --starts-rows
T=600 run python benchmarks/stage_probe.py pass_full --log2n 26 --r 32 --k 8192
T=600 run python benchmarks/stage_probe.py pass_full --log2n 26 --r 32 --k 32768

# 6) big-tile networks: merge-entry stages amortize with tile size
#    (k=32K merge-from-512 is 75 stages per 32K elems vs 60 per 16K)
T=600 run python benchmarks/stage_probe.py network --log2n 26 --k 32768 --nb 2
T=600 run python benchmarks/stage_probe.py merge --log2n 26 --k 32768 --nb 2 --merge-from 512
T=600 run python benchmarks/stage_probe.py merge --log2n 26 --k 65536 --nb 1 --merge-from 512

echo "=== drive complete $(date) ===" | tee -a "$LOG"

# 7) new-path validations (fused leaf+collapse, argsort composite)
T=900 run python - <<'PYEOF'
import time, jax, jax.numpy as jnp, numpy as np
import tpusort
n = 1 << 26
keys = jax.random.bits(jax.random.key(3), (n,), dtype=jnp.uint32)
probe = jax.jit(lambda o: jax.tree.leaves(o)[0].ravel()[:8])
sync = lambda o: np.asarray(probe(o))
f = jax.jit(tpusort.argsort)
sync(f(keys)); t0=time.perf_counter(); sync(f(keys)); dt=time.perf_counter()-t0
perm = np.asarray(f(keys))
k = np.asarray(keys)
assert np.all(np.diff(k[perm].astype(np.int64)) >= 0)
assert np.bincount(perm, minlength=n).max() == 1
print(f"argsort 2^26: {n/dt/1e6:.0f} M elem/s (sync-inclusive)")
PYEOF

# 8) segmented sort (CUB DeviceSegmentedRadixSort analog rows)
T=600 run python benchmarks/segmented_bench.py --log2n 26 --seg 4096
T=600 run python benchmarks/segmented_bench.py --log2n 26 --seg 16384
T=600 run python benchmarks/segmented_bench.py --log2n 24 --seg 4096 --ragged

# 9) the VERDICT-#2 artifact: entropy matrix at 2^28 (u32/u64/pairs x
#    entropy {1,2,4,8,0} + zipf) through the host-owned tier chain
T=3000 run python benchmarks/entropy_matrix.py -k $((1<<28)) --csv benchmarks/results/entropy_matrix_r2_28.csv
T=1800 run python benchmarks/entropy_matrix.py -k $((1<<26)) --pairs --stable --csv benchmarks/results/entropy_matrix_r2_pairs.csv
T=1800 run python benchmarks/entropy_matrix.py -k $((1<<26)) --types uint64 --csv benchmarks/results/entropy_matrix_r2_u64.csv
