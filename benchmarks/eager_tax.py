"""Eager-API host-tier tax measurement (VERDICT r4 #3).

Measures the SAME 2^28 uniform sort three ways on chip:

* jit path: ``jax.jit(tpusort.sort)`` (the BENCH headline discipline —
  in-graph cond fallback, no host tiering), minus probe-sync overhead;
* eager path: plain ``tpusort.sort`` — the host-owned tier chain users
  actually call (r4: 403 ms vs ~308 ms jit = ~30% tax; target <5%);
* eager warm steady state: repeated calls after the tier-decision cache
  is populated (the production pattern the r5 redesign optimizes:
  overlapped classify + cached tier + in-graph cond safety net).

Also validates outputs (sorted + multiset fingerprint) on every path and
exercises the correctness edges of the new flow: constant keys
(overflow -> in-graph fallback), a presorted input (identity
short-circuit), and a distribution switch against a warm cache.

    python benchmarks/eager_tax.py --log2n 28 --iters 3
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
from tpusort.utils import timing


def _log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def _mix(x):
    x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x846CA68B)
    return x ^ (x >> jnp.uint32(16))


@jax.jit
def _checks(k_out, k_in):
    ok = jnp.all(k_out[1:] >= k_out[:-1])
    ok &= jnp.sum(_mix(k_out)) == jnp.sum(_mix(k_in))
    return ok & (jnp.sum(k_out) == jnp.sum(k_in))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=28)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    n = 1 << args.log2n

    timing.honor_explicit_cpu()
    sync = timing.sync
    overhead = timing.measure_overhead()

    keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
    sync(keys)

    _log("input ready")
    # --- jit path (headline discipline) ---
    jfn = jax.jit(lambda k: tpusort.sort(k, algorithm="msd"))
    sync(jfn(keys))          # compile
    _log("jit compiled")
    ts = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        sync(jfn(keys))
        ts.append(time.perf_counter() - t0)
    t_jit = min(ts) - overhead
    _log(f"jit {t_jit*1e3:.1f} ms")

    # --- eager path, cold (first call classifies before dispatch) ---
    from tpusort import api
    api._TIER_CACHE.clear()
    t0 = time.perf_counter()
    out = tpusort.sort(keys, algorithm="msd")
    sync(out)
    t_cold = time.perf_counter() - t0 - overhead   # includes compile on miss
    _log(f"cold {t_cold*1e3:.1f} ms")
    assert bool(np.asarray(_checks(out, keys))), "cold eager output bad"

    # --- eager path, warm steady state ---
    ts = []
    for _ in range(args.iters + 1):
        t0 = time.perf_counter()
        out = tpusort.sort(keys, algorithm="msd")
        sync(out)
        ts.append(time.perf_counter() - t0)
    t_warm = min(ts[1:]) - overhead
    _log(f"warm {t_warm*1e3:.1f} ms")
    assert bool(np.asarray(_checks(out, keys))), "warm eager output bad"

    # --- correctness edges of the new flow ---
    # constant keys against the warm uniform cache: in-graph fallback path
    const = jnp.full((n,), jnp.uint32(7))
    out = tpusort.sort(const, algorithm="msd")
    ok_const = bool(np.asarray(_checks(out, const)))
    _log(f"const ok={ok_const}")
    # second call: the refreshed cache routes by the new classification
    out = tpusort.sort(const, algorithm="msd")
    ok_const2 = bool(np.asarray(_checks(out, const)))
    # presorted input: identity short-circuit (after one classify call)
    srt = jnp.arange(n, dtype=jnp.uint32)
    t0 = time.perf_counter()
    out = tpusort.sort(srt, algorithm="msd")
    sync(out)
    tpre1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = tpusort.sort(srt, algorithm="msd")
    sync(out)
    tpre2 = time.perf_counter() - t0
    ok_pre = bool(np.asarray(jnp.array_equal(out, srt)))

    row = {
        "n": n,
        "jit_ms": round(t_jit * 1e3, 2),
        "eager_cold_ms": round(t_cold * 1e3, 2),
        "eager_warm_ms": round(t_warm * 1e3, 2),
        "tax_pct": round(100.0 * (t_warm - t_jit) / t_jit, 2),
        "warm_mkeys_s": round(n / t_warm / 1e6, 1),
        "jit_mkeys_s": round(n / t_jit / 1e6, 1),
        "presorted_ms": [round(tpre1 * 1e3, 2), round(tpre2 * 1e3, 2)],
        "ok_const": ok_const and ok_const2,
        "ok_presorted": ok_pre,
    }
    print(json.dumps(row))


if __name__ == "__main__":
    main()
