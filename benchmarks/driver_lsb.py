"""LSB-style benchmark driver.

Mirrors the reference's ``lsb/sort.cu:85-164``: allocate key/value buffers,
generate 2^n uniform float32 keys + uint32 payloads (seed 0), run t trials
of a stable key-value sort and a descending keys-only sort, print one JSON
line with both timings (the reference's ``{"time_sort_kv_gpu": ...,
"time_sort_k_gpu": ...}`` output, ``lsb/sort.cu:148-151``).

    python benchmarks/driver_lsb.py --n 268435456 --t 3 [--v] [--algorithm]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

import tpusort
from tpusort.utils import timing


def main():
    timing.honor_explicit_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 28)
    ap.add_argument("--t", type=int, default=3)
    ap.add_argument("--v", action="store_true", help="print first 32 keys")
    ap.add_argument("--algorithm", default="auto")
    args = ap.parse_args()

    keys = jax.random.uniform(jax.random.key(0), (args.n,), dtype=jnp.float32)
    vals = jax.random.bits(jax.random.key(1), (args.n,), dtype=jnp.uint32)

    # EAGER calls: a jit wrapper would bypass the host-owned tier chain
    # (Tracers fail _host_tiered_applicable) and above 2^29 would silently
    # time the in-graph reference path instead of the engine
    kv = lambda k, v: tpusort.sort_pairs(k, v, algorithm=args.algorithm)
    kd = lambda k: tpusort.sort_keys_descending(k, algorithm=args.algorithm)

    t_kv = timing.measure_eager(kv, keys, vals, iters=args.t) * 1e3
    t_k = timing.measure_eager(kd, keys, iters=args.t) * 1e3

    if args.v:
        out = kd(keys)
        print(np.asarray(out[:32]))

    print(
        json.dumps(
            {
                "time_sort_kv_tpu": round(t_kv, 3),
                "time_sort_k_tpu": round(t_k, 3),
                "n": args.n,
                "pairs_per_sec": round(args.n / (t_kv / 1e3)),
                "keys_per_sec": round(args.n / (t_k / 1e3)),
            }
        )
    )


if __name__ == "__main__":
    main()
