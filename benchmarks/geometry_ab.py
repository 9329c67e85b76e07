"""A/B the registered TPU plan geometry against candidates, end-to-end.

Times the PUBLIC API (tpusort.sort / sort with values) with alternative
``SortConfig`` rows registered per run — the same mechanism the tuning
registry uses in production (the reference's RadixSortConfig TPB/KPT
table being re-measured, ``msb/src/sort/gpu_sort_config.h:146-207``).

Usage:
  python benchmarks/geometry_ab.py --log2n 28 [--pairs] [--u64] \
      [--configs base,big,big_nb2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np

import tpusort
from tpusort.configs import SortConfig, get_config, register_config

# candidate rows (DESIGN.md round-3 big-tile geometry)
CANDIDATES = {
    "base": dict(),  # whatever is registered today
    "big": dict(tile_elems=1 << 16, s1=2560, leaf_max=327680, pass_batch=1),
    "big_nb2": dict(tile_elems=1 << 16, s1=2560, leaf_max=327680,
                    pass_batch=2),
    "big_p3": dict(tile_elems=1 << 16, s1=2560, leaf_max=20480,
                   pass_batch=1),
    "big_leaf128k": dict(tile_elems=1 << 16, s1=2560, leaf_max=131072,
                         pass_batch=1),
    "k32": dict(tile_elems=1 << 15, s1=1280, leaf_max=163840, pass_batch=2),
    "big_r64": dict(tile_elems=1 << 16, radix=64, s1=1280, leaf_max=163840,
                    pass_batch=1),
    # stable pairs: payloads applied by one XLA gather instead of riding
    # the network (requires --pairs --stable)
    "gather": dict(pairs_gather_apply=True, pass_batch=4),
    "big_gather": dict(tile_elems=1 << 16, s1=2560, leaf_max=327680,
                       pass_batch=1, pairs_gather_apply=True),
    "big_pairs": dict(tile_elems=1 << 16, s1=2560, leaf_max=327680,
                      pass_batch=1),
    "big_pairs_nb2": dict(tile_elems=1 << 16, s1=2560, leaf_max=327680,
                          pass_batch=2),
    # 3-pass plan with a small leaf (multi-operand leaves pay the staged
    # merge per operand; a third partition pass may be cheaper)
    "big_p3_pairs": dict(tile_elems=1 << 16, s1=2560, leaf_max=20480,
                         pass_batch=2),
}


@jax.jit
def _probe(o):
    return jax.tree.map(lambda a: a.ravel()[:8], o)


def _sync(out):
    return np.asarray(jax.tree.leaves(_probe(out))[0])


def _time(fn, *args, iters=3):
    _sync(fn(*args))
    _sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    from tpusort.utils import timing as _timing

    _timing.honor_explicit_cpu()

    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=28)
    ap.add_argument("--pairs", action="store_true")
    ap.add_argument("--u64", action="store_true")
    ap.add_argument("--stable", action="store_true")
    ap.add_argument("--configs", default="base,big")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    n = 1 << args.log2n
    key_bits = 64 if args.u64 else 32
    dtype = jnp.uint64 if args.u64 else jnp.uint32
    if args.u64:
        hi = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
        lo = jax.random.bits(jax.random.key(1), (n,), dtype=jnp.uint32)
        data = (hi, lo)
    else:
        data = (jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32),)
    vals = (jnp.arange(n, dtype=jnp.uint32),) if args.pairs else ()

    overhead = _time(jax.jit(lambda a: a), jnp.zeros((8,), jnp.uint32),
                     iters=args.iters)
    base_cfg = get_config(key_bits, args.pairs)

    for name in args.configs.split(","):
        kw = CANDIDATES[name]
        cfg = (base_cfg if not kw
               else SortConfig(default_algorithm="msd", **kw))
        register_config(key_bits, args.pairs, "tpu", cfg)
        try:
            if args.u64:
                fn = jax.jit(lambda h, l, *v: tpusort.sort_planes(
                    (h, l), (v if v else None), key_dtype="uint64",
                    algorithm="msd", stable=args.stable))
            elif args.pairs:
                fn = jax.jit(lambda k, v: tpusort.sort(
                    k, v, algorithm="msd", stable=args.stable))
            else:
                fn = jax.jit(lambda k: tpusort.sort(k, algorithm="msd"))
            dt = _time(fn, *data, *vals, iters=args.iters) - overhead
            out = fn(*data, *vals)
            k_out = np.asarray(jax.tree.leaves(out)[0][: 1 << 20])
            ok = bool(np.all(np.diff(k_out.astype(np.int64)) >= 0))
            print(json.dumps({
                "config": name, "log2n": args.log2n,
                "pairs": args.pairs, "u64": args.u64,
                "stable": args.stable,
                "melem_s": round(n / max(dt, 1e-9) / 1e6, 1),
                "prefix_sorted": ok,
            }))
        except Exception as e:  # keep sweeping on a dead candidate
            print(json.dumps({"config": name, "error": repr(e)[:200]}))
        finally:
            register_config(key_bits, args.pairs, "tpu", base_cfg)


if __name__ == "__main__":
    main()
