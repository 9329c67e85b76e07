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
T=900 run python bench.py --log2n 28 --pairs --verify
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
T=600 run python benchmarks/stage_probe.py pass_gather --log2n 26 --nb 8
T=600 run python benchmarks/stage_probe.py leaf_gather --log2n 22 --check
T=600 run python benchmarks/stage_probe.py leaf_multi --log2n 26
T=600 run python benchmarks/stage_probe.py leaf_gather --log2n 26

# 2b) u16-subtile sortkey pass (keys-only headline candidate) vs the raw
#     pass_full baseline (section 5); --check validates on-chip lowering
T=600 run python benchmarks/stage_probe.py pass_u16 --log2n 22 --values 0 --check
T=600 run python benchmarks/stage_probe.py pass_u16 --log2n 26 --values 0 --r 16
T=600 run python benchmarks/stage_probe.py pass_u16 --log2n 26 --values 0 --r 32
T=600 run python benchmarks/stage_probe.py pass_u16 --log2n 26 --values 1 --r 32
T=600 run python benchmarks/stage_probe.py pass_u16 --log2n 26 --values 0 --r 32 --nb 8
# subtile-size sweep: stages(C) falls ~log^2 with C but the window-select
# cost grows with v_sub=K/C — find the knee ((r+1)*C <= 65536 throughout)
T=600 run python benchmarks/stage_probe.py pass_u16 --log2n 26 --values 0 --r 32 --c 512
T=600 run python benchmarks/stage_probe.py pass_u16 --log2n 26 --values 0 --r 32 --c 256
T=600 run python benchmarks/stage_probe.py pass_u16 --log2n 26 --values 0 --r 16 --c 1024
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
T=2400 run python benchmarks/entropy_matrix.py -k $((1<<28)) --types pairs --stable --csv benchmarks/results/entropy_matrix_r2_pairs.csv
T=2400 run python benchmarks/entropy_matrix.py -k $((1<<28)) --types uint64 --csv benchmarks/results/entropy_matrix_r2_u64.csv

# 10) the /verify edge battery, on-chip (small compiles)
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

# odd n (pass-0 pad validity)
n = (1 << 20) + 12345
k = jax.random.bits(jax.random.key(1), (n,), dtype=jnp.uint32)
chk("odd-n u32 keys", tpusort.sort(k), np_sort_oracle(np.asarray(k)))

# entropy-0 constant (overflow/skew tier must return exact)
k0 = jnp.zeros((1 << 20,), jnp.uint32)
chk("constant keys", tpusort.sort(k0), np.asarray(k0))

# block of 0xFFFFFFFF (keys-only sentinel-tie multiset edge)
km = np.asarray(jax.random.bits(jax.random.key(2), (1 << 20,), dtype=jnp.uint32))
km[1000:200000] = 0xFFFFFFFF
chk("0xFFFFFFFF block", tpusort.sort(jnp.asarray(km)), np_sort_oracle(km))

# stable pairs with enumerated values
n2 = 1 << 20
kp = jax.random.bits(jax.random.key(3), (n2,), dtype=jnp.uint32) & jnp.uint32(0xFFFF)
vp = jnp.arange(n2, dtype=jnp.uint32)
gk, gv = tpusort.sort(kp, vp)
wk, wv = np_sort_oracle(np.asarray(kp), np.asarray(vp))
chk("stable pairs keys", gk, wk)
chk("stable pairs values", gv, wv)

# f32 with NaNs, descending
f = np.asarray(jax.random.normal(jax.random.key(4), ((1 << 20),), jnp.float32))
f[::97] = np.nan
f[1::101] = -0.0
gd = tpusort.sort_keys_descending(jnp.asarray(f))
chk("f32 NaN descending", gd, np_sort_oracle(f, descending=True))

print("edge battery:", "ALL PASS" if not fails else f"FAILURES: {fails}")
PYEOF
