"""Stable-pairs lever probes (VERDICT r4 #2).

Measures, on chip, the quantities that decide the stable-pairs
architecture:

* ``take``: one whole-array XLA gather of a 32-bit payload by a random
  permutation (the gather-apply path's per-payload cost; r1 measured
  118 M elem/s at 2^26 via a different formulation — re-measure with
  ``jnp.take(..., unique_indices=True, mode="clip")`` at production
  sizes);
* ``argsort2``: the composite (key, position) 2-plane unstable sort —
  the gather-apply path's sort cost (= the permutation producer);
* ``stable3``: the current default stable-pairs path (composite key +
  payload riding the network, 3 operands);
* ``gapply``: end-to-end stable pairs with ``pairs_gather_apply=True``;
* ``unstable2``: the raw-key unstable pairs path (2 operands) — the
  floor any stable path is chasing.

    python benchmarks/pairs_probe.py --log2n 26
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
from tpusort import configs as _configs
from tpusort.utils import timing


def _time(sync, overhead, fn, *args, iters=3):
    sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) - overhead


def main():
    timing.honor_explicit_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=26)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--probes", nargs="*",
                    default=["take", "argsort2", "stable3", "gapply",
                             "unstable2"])
    args = ap.parse_args()
    n = 1 << args.log2n

    sync = timing.sync
    overhead = timing.measure_overhead()
    keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
    vals = jnp.arange(n, dtype=jnp.uint32)
    perm = jax.random.permutation(jax.random.key(1), n).astype(jnp.int32)
    sync((keys, vals, perm))

    out = {"n": n}

    if "take" in args.probes:
        f = jax.jit(lambda v, p: jnp.take(v, p, unique_indices=True,
                                          mode="clip"))
        dt = _time(sync, overhead, f, vals, perm, iters=args.iters)
        out["take_ms"] = round(dt * 1e3, 2)
        out["take_melem_s"] = round(n / dt / 1e6, 1)
        print(f"# take {out['take_melem_s']} Melem/s", file=sys.stderr,
              flush=True)

    if "argsort2" in args.probes:
        f = jax.jit(lambda k: tpusort.argsort(k))
        dt = _time(sync, overhead, f, keys, iters=args.iters)
        out["argsort2_ms"] = round(dt * 1e3, 2)
        out["argsort2_melem_s"] = round(n / dt / 1e6, 1)
        print(f"# argsort2 {out['argsort2_melem_s']} Melem/s",
              file=sys.stderr, flush=True)

    if "stable3" in args.probes:
        f = jax.jit(lambda k, v: tpusort.sort(k, v, stable=True))
        dt = _time(sync, overhead, f, keys, vals, iters=args.iters)
        out["stable3_ms"] = round(dt * 1e3, 2)
        out["stable3_mpairs_s"] = round(n / dt / 1e6, 1)
        print(f"# stable3 {out['stable3_mpairs_s']} Mpairs/s",
              file=sys.stderr, flush=True)

    if "gapply" in args.probes:
        base = _configs.get_config(32, True, "tpu")
        from dataclasses import replace
        _configs.register_config(32, True, "tpu",
                                 replace(base, pairs_gather_apply=True))
        try:
            f = jax.jit(lambda k, v: tpusort.sort(k, v, stable=True))
            dt = _time(sync, overhead, f, keys, vals, iters=args.iters)
            out["gapply_ms"] = round(dt * 1e3, 2)
            out["gapply_mpairs_s"] = round(n / dt / 1e6, 1)
            gk, gv = f(keys, vals)
            ok = jnp.all(gk[1:] >= gk[:-1])
            ok &= jnp.all(jnp.take(keys, gv.astype(jnp.int32)) == gk)
            ok &= jnp.all((gk[1:] != gk[:-1]) | (gv[1:] > gv[:-1]))
            out["gapply_verified"] = bool(np.asarray(jax.jit(lambda o: o)(ok)))
            print(f"# gapply {out['gapply_mpairs_s']} Mpairs/s "
                  f"verified={out['gapply_verified']}", file=sys.stderr,
                  flush=True)
        except Exception as e:  # compile failure is a result, not a crash
            out["gapply_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        finally:
            _configs.register_config(32, True, "tpu", base)

    if "unstable2" in args.probes:
        f = jax.jit(lambda k, v: tpusort.sort(k, v, stable=False))
        dt = _time(sync, overhead, f, keys, vals, iters=args.iters)
        out["unstable2_ms"] = round(dt * 1e3, 2)
        out["unstable2_mpairs_s"] = round(n / dt / 1e6, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
