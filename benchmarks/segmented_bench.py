"""Segmented-sort benchmark (CUB DeviceSegmentedRadixSort analog).

Mirrors the vendored CUB's segmented headline row (3.1 B keys/s on TitanX,
``lsb/cub/cub/device/dispatch/dispatch_radix_sort.cuh:637``): sort many
independent segments of 32-bit keys on one chip.

    python benchmarks/segmented_bench.py [--log2n 26] [--seg 4096] [--ragged]

Prints one JSON line per mode.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpusort.ops.segmented import segmented_sort, sort_batched


@jax.jit
def _probe(o):
    return jax.tree.leaves(o)[0].ravel()[:8]


def _sync(out):
    return np.asarray(_probe(out))


def _time(fn, *args, iters=3):
    _sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    # sitecustomize force-selects the TPU platform; honor an explicit cpu
    # request programmatically BEFORE the first device query
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=26)
    ap.add_argument("--seg", type=int, default=4096,
                    help="segment size (uniform mode)")
    ap.add_argument("--ragged", action="store_true",
                    help="ragged segments via segmented_sort")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    n = 1 << args.log2n
    keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)

    overhead = _time(jax.jit(lambda a: a), jnp.zeros((8,), jnp.uint32),
                     iters=args.iters)
    if args.ragged:
        nseg = n // args.seg
        # ragged boundaries: jittered around the uniform size, cumsum'd
        rng = np.random.default_rng(1)
        sizes = rng.integers(args.seg // 2, args.seg * 3 // 2, nseg)
        sizes[-1] += n - sizes.sum()
        offs = jnp.asarray(np.concatenate([[0], np.cumsum(sizes)])
                           .astype(np.int32))
        fn = jax.jit(lambda k: segmented_sort(k, offs))
        dt = _time(fn, keys, iters=args.iters) - overhead
        out = np.asarray(fn(keys))
        offs_np = np.asarray(offs)
        ok = all(
            np.all(np.diff(out[offs_np[i]:offs_np[i + 1]].astype(np.int64))
                   >= 0)
            for i in range(min(nseg, 64))
        )
        mode = "ragged"
    else:
        b = n // args.seg
        fn = jax.jit(lambda k: sort_batched(k.reshape(b, args.seg)))
        dt = _time(fn, keys, iters=args.iters) - overhead
        out = np.asarray(fn(keys))
        ok = bool(np.all(np.diff(out[:64].astype(np.int64), axis=1) >= 0))
        mode = "uniform"

    print(json.dumps({
        "metric": f"segmented_keys_per_sec_{mode}",
        "n": n,
        "seg": args.seg,
        "value": round(n / max(dt, 1e-9)),
        "sorted": ok,
    }))


if __name__ == "__main__":
    main()
