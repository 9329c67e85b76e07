"""Distributed global-sort benchmark (runs on whatever mesh is available).

On a pod slice this measures the real multi-chip path (splitters,
all-to-all, engine-local sorts); on one chip it degenerates to D=1.  On a
CPU host, set XLA_FLAGS=--xla_force_host_platform_device_count=N to
exercise the code path (throughput numbers then mean little).

    python benchmarks/distributed_bench.py [--log2n 24] [--pairs]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpusort.parallel.global_sort import make_global_sort


@jax.jit
def _probe(o):
    return jax.tree.leaves(o)[0].ravel()[:8]


def _sync(out):
    return np.asarray(_probe(out))


def main():
    from tpusort.utils import timing as _timing

    _timing.honor_explicit_cpu()

    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=24)
    ap.add_argument("--pairs", action="store_true")
    ap.add_argument("--chunks", type=int, default=1,
                    help="split the all-to-all into this many chunks "
                         "(double-buffered overlap with local binning)")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    d = len(jax.devices())
    n = (1 << args.log2n) // d * d
    mesh = jax.make_mesh((d,), ("x",))
    sorter = make_global_sort(mesh, chunks=args.chunks)

    keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
    vals = jnp.arange(n, dtype=jnp.uint32) if args.pairs else None
    fn = jax.jit(lambda k, v: sorter(k, v)) if args.pairs else \
        jax.jit(lambda k: sorter(k))
    a = (keys, vals) if args.pairs else (keys,)

    _sync(fn(*a))
    ts = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        _sync(fn(*a))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    out = fn(*a)
    host = np.asarray(out[0] if args.pairs else out).astype(np.int64)
    # sortedness alone would pass degenerate outputs (all zeros, one shard
    # replicated); also require the key multiset to survive
    kin = np.asarray(keys).astype(np.uint32)
    kout = host.astype(np.uint32)
    ok = bool(
        np.all(np.diff(host) >= 0)
        and kin.sum(dtype=np.uint64) == kout.sum(dtype=np.uint64)
        and np.bitwise_xor.reduce(kin ^ (kin >> 7))
        == np.bitwise_xor.reduce(kout ^ (kout >> 7))
    )
    print(json.dumps({
        "metric": "global_sort_keys_per_sec",
        "devices": d,
        "n": n,
        "chunks": args.chunks,
        "value": round(n / dt),
        "ms": round(dt * 1e3, 2),
        "sorted": ok,
    }))


if __name__ == "__main__":
    main()
