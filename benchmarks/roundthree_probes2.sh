#!/bin/bash
# Round-3 stage A2: re-run the probes that failed or drowned in sync noise
# in stage A (VMEM OOM at nb=4, u32->f32 cast, i8 add, too-small MXU
# workloads, illegal gather block specs).
cd /root/repo
LOG=benchmarks/results/roundthree_probes.log
run() {
  echo "=== $* === $(date +%H:%M:%S)" | tee -a "$LOG"
  timeout "${T:-420}" "$@" 2>&1 | grep -vE "WARNING|^I[0-9]" | tee -a "$LOG"
  return "${PIPESTATUS[0]}"
}

T=120 run python -c "import jax,jax.numpy as jnp,numpy as np; print('TPU OK', np.asarray(jax.jit(lambda a:(a*2).sum())(jnp.arange(1024))))" || exit 1

run python benchmarks/stage_probe.py gather
run python benchmarks/stage_probe.py rankdest --r 16 --nb 1 --check
run python benchmarks/stage_probe.py rankdest --r 32 --nb 1
run python benchmarks/stage_probe.py rowperm_mm --check
run python benchmarks/stage_probe.py matmul --dtype bf16
run python benchmarks/stage_probe.py matmul --dtype s8
run python benchmarks/stage_probe.py matmul --dtype f32
run python benchmarks/stage_probe.py thin_mm --w 2
run python benchmarks/stage_probe.py thin_mm --w 8
run python benchmarks/stage_probe.py thin_mm --w 128
run python benchmarks/stage_probe.py batch_mm --w 2
run python benchmarks/stage_probe.py batch_mm --w 8

run python benchmarks/stage_probe.py starts --r 32
run python benchmarks/stage_probe.py starts --r 128
run python benchmarks/stage_probe.py starts_rows --r 128

# roll-axis / layout-swap hypothesis: are lane rolls the 5x efficiency gap?
run python benchmarks/stage_probe.py roll --axis lane
run python benchmarks/stage_probe.py roll --axis sublane
run python benchmarks/stage_probe.py roll --axis lane --dist 32
run python benchmarks/stage_probe.py roll --axis sublane --dist 32
run python benchmarks/stage_probe.py transpose
T=600 run python benchmarks/stage_probe.py network_swapped --log2n 26
T=600 run python benchmarks/stage_probe.py merge_swapped --log2n 26 --merge-from 512

echo "=== probes2 complete $(date) ===" | tee -a "$LOG"
