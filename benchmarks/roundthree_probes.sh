#!/bin/bash
# Round-3 stage A: the architecture-decision probe battery (VERDICT r2 #1).
# Run FIRST on a live chip — cheap compiles, decisive for the local-phase
# successor choice (MXU counting-rank vs starts_rows r=128 vs u16 subtile).
# Appends to benchmarks/results/roundthree_probes.log.
cd /root/repo
LOG=benchmarks/results/roundthree_probes.log
run() {
  echo "=== $* === $(date +%H:%M:%S)" | tee -a "$LOG"
  timeout "${T:-420}" "$@" 2>&1 | grep -vE "WARNING|^I[0-9]" | tee -a "$LOG"
  return "${PIPESTATUS[0]}"
}

# 0) recovery check
T=120 run python -c "import jax,jax.numpy as jnp,numpy as np; print('TPU OK', np.asarray(jax.jit(lambda a:(a*2).sum())(jnp.arange(1024))))" || exit 1

# 1) architecture-decision probes (cheap, decisive — the round-2 casualties)
run python benchmarks/stage_probe.py rankdest --r 16 --check
run python benchmarks/stage_probe.py rankdest --r 32
run python benchmarks/stage_probe.py rowperm_mm --check
run python benchmarks/stage_probe.py batch_mm --w 2
run python benchmarks/stage_probe.py batch_mm --w 8
run python benchmarks/stage_probe.py matmul --dtype bf16
run python benchmarks/stage_probe.py matmul --dtype s8
run python benchmarks/stage_probe.py matmul --dtype f32
run python benchmarks/stage_probe.py thin_mm --w 2
run python benchmarks/stage_probe.py thin_mm --w 8
run python benchmarks/stage_probe.py thin_mm --w 128
run python benchmarks/stage_probe.py dynstore --check

# 2) 16-bit network rate (u16 sortkey candidate)
T=600 run python benchmarks/stage_probe.py network --log2n 26 --dtype u16
T=600 run python benchmarks/stage_probe.py network --log2n 26 --dtype u32

# 3) starts variants (r=128 enabler) + pass-level k sweep
run python benchmarks/stage_probe.py starts --r 32
run python benchmarks/stage_probe.py starts_rows --r 32
run python benchmarks/stage_probe.py starts --r 128
run python benchmarks/stage_probe.py starts_rows --r 128
T=600 run python benchmarks/stage_probe.py pass_full --log2n 26 --r 32
T=600 run python benchmarks/stage_probe.py pass_full --log2n 26 --r 32 --starts-rows
T=600 run python benchmarks/stage_probe.py pass_full --log2n 26 --r 32 --k 8192
T=600 run python benchmarks/stage_probe.py pass_full --log2n 26 --r 32 --k 32768

# 4) big-tile networks: merge-entry stages amortize with tile size
T=600 run python benchmarks/stage_probe.py network --log2n 26 --k 32768 --nb 2
T=600 run python benchmarks/stage_probe.py merge --log2n 26 --k 32768 --nb 2 --merge-from 512
T=600 run python benchmarks/stage_probe.py merge --log2n 26 --k 65536 --nb 1 --merge-from 512

echo "=== probes complete $(date) ===" | tee -a "$LOG"
