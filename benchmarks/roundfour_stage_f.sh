#!/bin/bash
# Round-4 stage F: pairs geometry A/B (nb2 / 3-pass-small-leaf) +
# equidepth attribution rerun.
cd /root/repo
LOG=benchmarks/results/roundfour_stage_f.log
health() {
  for i in $(seq 1 200); do
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
T=2400 run python benchmarks/geometry_ab.py --log2n 28 --pairs --stable --configs big_pairs_nb2
T=2400 run python benchmarks/geometry_ab.py --log2n 28 --pairs --stable --configs big_p3_pairs
T=2400 run python benchmarks/equidepth_profile.py --log2n 28 --entropy 2
T=1800 run python bench.py --log2n 28 --pairs --unstable --verify
T=1200 run python bench.py --log2n 29 --verify
echo "=== roundfour stage F complete $(date) ===" | tee -a "$LOG"
