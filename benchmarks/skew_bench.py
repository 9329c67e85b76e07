"""Skewed-distribution benchmark (BASELINE config #4).

64-bit Zipfian keys (heavy duplication across a bounded universe) through
the plane-level 64-bit interface, plus the uniform-u64 baseline — exercises
digit skew handling (padding absorption / overflow fallback) and the 64-bit
two-plane lexicographic fast path.

    python benchmarks/skew_bench.py [--log2n 26] [--alpha 1.1] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import tpusort
from tpusort.utils import timing


def _planes_from_u64(arr: np.ndarray):
    return (jnp.asarray((arr >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)))


def main():
    timing.honor_explicit_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=26)
    ap.add_argument("--alpha", type=float, default=1.1)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--algorithm", default="auto")
    args = ap.parse_args()
    n = 1 << args.log2n

    # EAGER call: a jit wrapper would turn the host-owned tier chain into
    # the in-graph path, whose u64 overflow fallback is the exact reference
    # sort — the zipf row would time (and verify) the wrong engine
    fn = lambda h, l: tpusort.sort_planes(
        (h, l), key_dtype="uint64", algorithm=args.algorithm)

    results = {}
    rng = np.random.default_rng(0)
    uniform = rng.integers(0, 1 << 63, n, dtype=np.uint64) << np.uint64(1) \
        | rng.integers(0, 2, n, dtype=np.uint64)
    zipf = _host_zipf(n, args.alpha)

    for name, arr in [("uniform_u64", uniform), ("zipf_u64", zipf)]:
        hi, lo = _planes_from_u64(arr)
        dt = timing.measure_eager(fn, hi, lo, iters=args.iters)
        # verify on host
        ohi, olo = fn(hi, lo)
        got = (np.asarray(ohi).astype(np.uint64) << np.uint64(32)) | \
            np.asarray(olo).astype(np.uint64)
        ok = bool(np.array_equal(got, np.sort(arr)))
        results[name] = {
            "mkeys_per_s": round(n / max(dt, 1e-9) / 1e6, 1),
            "ms": round(dt * 1e3, 2),
            "verified": ok,
        }
    print(json.dumps({"n": n, "alpha": args.alpha, **results}))


def _host_zipf(n: int, alpha: float, universe: int = 1 << 20) -> np.ndarray:
    """Host-side Zipfian u64 keys (duplication-heavy; hashed spread)."""
    ranks = np.arange(1, universe + 1, dtype=np.float64)
    cdf = np.cumsum(ranks ** (-alpha))
    cdf /= cdf[-1]
    u = np.random.default_rng(1).random(n)
    idx = np.searchsorted(cdf, u).astype(np.uint64)
    return idx * np.uint64(0x9E3779B97F4A7C15)


if __name__ == "__main__":
    main()
