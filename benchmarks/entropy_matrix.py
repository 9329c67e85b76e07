"""Entropy-matrix benchmark/verification driver.

The analog of the reference's gtest runner (``msb/tests/main.cu:12-72`` with
``-r/-k/-p/-s`` flags) and its entropy/type/size matrix
(``test_sort_keys.cu:124-195``): every run sorts with the engine under test,
verifies against the in-framework oracle, and records metrics in a
BM-style profile table (``msb/external/benchmark/benchmark.h``).

    python benchmarks/entropy_matrix.py -k 16777216 -r 2 \
        [--algorithm msd] [--entropies 1 2 4 0] [--csv out.csv]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

import tpusort
from tpusort.utils import datagen, timing
from tpusort.utils.profiling import Profile


def verify(keys, got) -> bool:
    """Oracle check: engine output vs the stable reference engine."""
    want = jax.jit(lambda k: tpusort.sort(k, algorithm="reference"))(keys)
    return bool(
        jnp.array_equal(got.view(jnp.uint32), want.view(jnp.uint32))
        if got.dtype.itemsize == 4
        else jnp.array_equal(got.view(jnp.uint64), want.view(jnp.uint64))
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-k", "--num-keys", type=int, default=1 << 24)
    ap.add_argument("-r", "--repeats", type=int, default=1)
    ap.add_argument("--algorithm", default="auto")
    ap.add_argument("--types", nargs="+",
                    default=["uint32", "float32", "uint64"])
    ap.add_argument("--entropies", type=int, nargs="+",
                    default=[1, 2, 4, 8, 0])
    ap.add_argument("--no-verify", action="store_true")
    ap.add_argument("--csv")
    args = ap.parse_args()

    prof = Profile(f"entropy_matrix_{args.algorithm}")
    for dtype in args.types:
        fn = jax.jit(lambda k: tpusort.sort(k, algorithm=args.algorithm))
        for entropy in args.entropies:
            keys = (
                datagen.random_keys(jax.random.key(0), args.num_keys, dtype)
                if entropy == 1
                else datagen.entropy_keys(
                    jax.random.key(0), args.num_keys, entropy, dtype
                )
            )
            with prof.run(dtype=dtype, entropy=entropy,
                          num_keys=args.num_keys) as r:
                dt = timing.measure(fn, keys, iters=args.repeats)
                r.set_metric("sort_ms", dt * 1e3)
                r.set_metric("mkeys_per_s", args.num_keys / dt / 1e6)
                if not args.no_verify:
                    r.set_metric("verified", verify(keys, fn(keys)))

    print(prof.table())
    if args.csv:
        with open(args.csv, "w") as f:
            f.write(prof.csv())
        print(f"csv written to {args.csv}")


if __name__ == "__main__":
    main()
