#!/bin/bash
# Round-3 stage A3: validate the big-tile/low-alpha geometry (k=65536, nb=1,
# s1=2560) suggested by the merge k=65536 nb=1 result (1.89 ps/elem/stage vs
# 2.76 at k=16384 nb=4) — the candidate 2^28 plan models at ~1.18 G keys/s.
cd /root/repo
LOG=benchmarks/results/roundthree_probes.log
run() {
  echo "=== $* === $(date +%H:%M:%S)" | tee -a "$LOG"
  timeout "${T:-600}" "$@" 2>&1 | grep -vE "WARNING|^I[0-9]" | tee -a "$LOG"
  return "${PIPESTATUS[0]}"
}

T=120 run python -c "import jax,jax.numpy as jnp,numpy as np; print('TPU OK', np.asarray(jax.jit(lambda a:(a*2).sum())(jnp.arange(1024))))" || exit 1

# full-sort network at 64K nb=1 (pass-0 cost) + batching interaction
run python benchmarks/stage_probe.py network --log2n 26 --k 65536 --nb 1
run python benchmarks/stage_probe.py network --log2n 26 --k 16384 --nb 8
run python benchmarks/stage_probe.py network --log2n 26 --k 32768 --nb 1
run python benchmarks/stage_probe.py merge --log2n 26 --k 65536 --nb 1 --merge-from 2048

# the production pass at the candidate geometry
run python benchmarks/stage_probe.py pass_full --log2n 26 --r 32 --k 65536 --nb 1 --s 2560
run python benchmarks/stage_probe.py pass_full --log2n 26 --r 32 --k 65536 --nb 1
run python benchmarks/stage_probe.py pass_full --log2n 26 --r 32 --k 16384 --nb 8

# layout swap at big-tile geometry
T=600 run python benchmarks/stage_probe.py network_swapped --log2n 26 --k 65536 --nb 1
T=600 run python benchmarks/stage_probe.py merge_swapped --log2n 26 --k 65536 --nb 1 --merge-from 512
T=600 run python benchmarks/stage_probe.py merge_swapped --log2n 26 --k 65536 --nb 1 --merge-from 2048

# multi-operand networks at big-tile geometry (stable pairs / u64 cost)
run python benchmarks/stage_probe.py network --log2n 26 --k 65536 --nb 1 --ops 3
run python benchmarks/stage_probe.py network --log2n 26 --k 16384 --nb 4 --ops 3
run python benchmarks/stage_probe.py network --log2n 26 --k 65536 --nb 1 --ops 2
run python benchmarks/stage_probe.py network --log2n 26 --k 65536 --nb 1 --ops 2 --num-keys 2

echo "=== probes3 complete $(date) ===" | tee -a "$LOG"
