#!/bin/bash
# Round-3 stage D2: follow-ups after stage D — the payload-riding big-tile
# pairs row (3 network operands at nb=1 exploit the unbatched latency
# slack), u64 pairs big row, and headline re-checks at final configs.
cd /root/repo
LOG=benchmarks/results/roundthree_stage_d.log
run() {
  echo "=== $* === $(date +%H:%M:%S)" | tee -a "$LOG"
  timeout "${T:-1500}" "$@" 2>&1 | grep -vE "WARNING|^I[0-9]" | tee -a "$LOG"
  return "${PIPESTATUS[0]}"
}

T=120 run python -c "import jax,jax.numpy as jnp,numpy as np; print('TPU OK', np.asarray(jax.jit(lambda a:(a*2).sum())(jnp.arange(1024))))" || exit 1

T=1800 run python benchmarks/geometry_ab.py --log2n 26 --pairs --stable --configs big_pairs
T=2400 run python benchmarks/geometry_ab.py --log2n 28 --pairs --stable --configs big_pairs
T=1800 run python benchmarks/geometry_ab.py --log2n 26 --pairs --configs big_pairs   # unstable pairs, big tile
T=1800 run python benchmarks/geometry_ab.py --log2n 26 --u64 --pairs --stable --configs big_pairs

# where do the modeled big-tile gains go?  per-stage timing at the
# registered production geometry (k=65536 nb=2)
T=1800 run python benchmarks/pipeline_profile.py 28
T=1500 run python bench.py --log2n 29 --verify

echo "=== roundthree stage D2 complete $(date) ===" | tee -a "$LOG"
