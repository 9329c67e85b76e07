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

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpusort.ops.segmented import segmented_sort, sort_batched
from tpusort.utils import timing


def main():
    timing.honor_explicit_cpu()

    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=26)
    ap.add_argument("--seg", type=int, default=4096,
                    help="segment size (uniform mode; mean size ragged)")
    ap.add_argument("--ragged", action="store_true",
                    help="ragged segments via segmented_sort")
    ap.add_argument("--pairs", action="store_true",
                    help="carry a uint32 payload (ragged pairs ride the "
                         "raw-plane engine; stable pairs the composite)")
    ap.add_argument("--stable", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    n = 1 << args.log2n
    keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)

    if args.ragged:
        nseg = n // args.seg
        # ragged boundaries: nseg-1 sorted uniform cut points (sizes vary
        # around the mean; empty segments are legal)
        rng = np.random.default_rng(1)
        cuts = np.sort(rng.integers(0, n + 1, nseg - 1))
        offs_np = np.concatenate([[0], cuts, [n]]).astype(np.int32)
        offs = jnp.asarray(offs_np)
        if args.pairs:
            vals = jnp.arange(n, dtype=jnp.uint32)
            fn = lambda k, v: segmented_sort(k, offs, v,  # noqa: E731
                                             stable=args.stable)
            dt = timing.measure(fn, keys, vals, iters=args.iters)
            outk, outv = jax.jit(fn)(keys, vals)
            out = np.asarray(outk).astype(np.int64)
            gv = np.asarray(outv)
        else:
            fn = lambda k: segmented_sort(k, offs)  # noqa: E731
            dt = timing.measure(fn, keys, iters=args.iters)
            out = np.asarray(jax.jit(fn)(keys)).astype(np.int64)
            gv = None
        # every within-segment adjacent pair must be ordered; pairs that
        # straddle a boundary are exempt
        d = np.diff(out)
        boundary = np.zeros(n - 1, bool)
        inner = offs_np[1:-1]
        inner = inner[(inner > 0) & (inner < n)]
        boundary[inner - 1] = True
        ok = bool(np.all((d >= 0) | boundary))
        # sortedness alone passes degenerate outputs — the multiset must
        # survive too (same check distributed_bench grew)
        ok = ok and bool(np.array_equal(np.sort(out),
                                        np.sort(np.asarray(keys)
                                                .astype(np.int64))))
        if gv is not None:
            # pair binding: every output pair maps to its original key,
            # and the payload is a permutation (checksum)
            ok = ok and bool(np.array_equal(
                np.asarray(keys).astype(np.int64)[gv], out))
            ok = ok and int(gv.astype(np.uint64).sum()) == \
                n * (n - 1) // 2
        mode = "ragged_pairs" if args.pairs else "ragged"
        if args.pairs and args.stable:
            mode = "ragged_pairs_stable"
    else:
        b = n // args.seg
        fn = lambda k: sort_batched(k.reshape(b, args.seg))  # noqa: E731
        dt = timing.measure(fn, keys, iters=args.iters)
        out = np.asarray(jax.jit(fn)(keys)).astype(np.int64)
        ok = bool(np.all(np.diff(out, axis=1) >= 0))
        ok = ok and bool(np.array_equal(np.sort(out.ravel()),
                                        np.sort(np.asarray(keys)
                                                .astype(np.int64))))
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
