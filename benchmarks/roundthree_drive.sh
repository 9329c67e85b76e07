#!/bin/bash
# Round-3 stage B: headline + artifact drive, ordered by value-per-minute
# (VERDICT r2 #4/#5/#6: 2^30 claim, on-chip entropy matrix + edge battery,
# u64 re-measure).  Run AFTER the geometry work lands; appends to
# benchmarks/results/roundthree_drive.log.
cd /root/repo
LOG=benchmarks/results/roundthree_drive.log
run() {
  echo "=== $* === $(date +%H:%M:%S)" | tee -a "$LOG"
  timeout "${T:-900}" "$@" 2>&1 | grep -vE "WARNING|^I[0-9]" | tee -a "$LOG"
  return "${PIPESTATUS[0]}"
}

# 0) recovery check
T=120 run python -c "import jax,jax.numpy as jnp,numpy as np; print('TPU OK', np.asarray(jax.jit(lambda a:(a*2).sum())(jnp.arange(1024))))" || exit 1

# 1) headline rows (the round's recorded metrics)
run python bench.py --log2n 28 --verify
run python bench.py --log2n 28 --pairs --verify
run python bench.py --log2n 26 --pairs --unstable
run python bench.py --log2n 29
T=1500 run python bench.py --log2n 30
T=1800 run python bench.py --log2n 30 --verify

# 2) the VERDICT-#5 artifacts: entropy matrix at 2^28 + edge battery —
#    run EARLY so a tunnel death can't erase them again
T=3600 run python benchmarks/entropy_matrix.py -k $((1<<28)) --csv benchmarks/results/entropy_matrix_r3_28.csv
T=900 run python - <<'PYEOF'
import jax, jax.numpy as jnp, numpy as np, sys
sys.path.insert(0, "tests")
import tpusort
from oracle import np_sort_oracle

fails = []
def chk(name, got, want):
    g, w = np.asarray(got), np.asarray(want)
    ok = g.dtype == w.dtype and np.array_equal(g.view(np.uint8), w.view(np.uint8))
    print(("PASS" if ok else "FAIL"), name)
    if not ok:
        fails.append(name)

n = (1 << 20) + 12345
k = jax.random.bits(jax.random.key(1), (n,), dtype=jnp.uint32)
chk("odd-n u32 keys", tpusort.sort(k), np_sort_oracle(np.asarray(k)))

k0 = jnp.zeros((1 << 20,), jnp.uint32)
chk("constant keys", tpusort.sort(k0), np.asarray(k0))

km = np.asarray(jax.random.bits(jax.random.key(2), (1 << 20,), dtype=jnp.uint32))
km[1000:200000] = 0xFFFFFFFF
chk("0xFFFFFFFF block", tpusort.sort(jnp.asarray(km)), np_sort_oracle(km))

n2 = 1 << 20
kp = jax.random.bits(jax.random.key(3), (n2,), dtype=jnp.uint32) & jnp.uint32(0xFFFF)
vp = jnp.arange(n2, dtype=jnp.uint32)
gk, gv = tpusort.sort(kp, vp)
wk, wv = np_sort_oracle(np.asarray(kp), np.asarray(vp))
chk("stable pairs keys", gk, wk)
chk("stable pairs values", gv, wv)

f = np.asarray(jax.random.normal(jax.random.key(4), ((1 << 20),), jnp.float32))
f[::97] = np.nan
f[1::101] = -0.0
gd = tpusort.sort_keys_descending(jnp.asarray(f))
chk("f32 NaN descending", gd, np_sort_oracle(f, descending=True))

print("edge battery:", "ALL PASS" if not fails else f"FAILURES: {fails}")
PYEOF

# 3) pairs/u64 entropy matrices at 2^28 (the round-2 casualties)
T=3000 run python benchmarks/entropy_matrix.py -k $((1<<28)) --types pairs --stable --csv benchmarks/results/entropy_matrix_r3_pairs.csv
T=3000 run python benchmarks/entropy_matrix.py -k $((1<<28)) --types uint64 --csv benchmarks/results/entropy_matrix_r3_u64.csv

# 4) u64 + size ladder rows
T=1200 run python benchmarks/size_sweep.py --sizes 22,24,26,28,29
T=900 run python benchmarks/driver_lsb.py --log2n 28

# 5) segmented + argsort validations
T=600 run python benchmarks/segmented_bench.py --log2n 26 --seg 4096
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

# 6) distributed shard-stage profile on the single chip (VERDICT #9)
T=1200 run python benchmarks/pipeline_profile.py --log2n 28

echo "=== roundthree drive complete $(date) ===" | tee -a "$LOG"
