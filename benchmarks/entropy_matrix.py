"""Entropy-matrix benchmark/verification driver.

The analog of the reference's gtest runner (``msb/tests/main.cu:12-72`` with
``-r/-k/-p/-s`` flags) and its entropy/type/size matrix
(``test_sort_keys.cu:124-195``): every run sorts with the engine under test,
verifies against the in-framework oracle, and records metrics in a
BM-style profile table (``msb/external/benchmark/benchmark.h``).

Round-2 matrix (VERDICT #2): u32 / u64-planes / pairs rows x entropy
{1,2,4,8,0} + zipf.  The public API's host-owned tier chain routes each
row: radix fast path, equi-depth skew tier, exact fallback.

    python benchmarks/entropy_matrix.py -k 16777216 -r 2 \
        [--pairs] [--stable] [--types uint32 uint64 float32] \
        [--entropies 1 2 4 8 0 zipf] [--csv out.csv]
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


def _gen_u32(n: int, entropy, seed: int = 0) -> jax.Array:
    if entropy == "zipf":
        return datagen.zipf_keys(jax.random.key(seed), n, alpha=1.1,
                                 dtype=jnp.uint32)
    e = int(entropy)
    if e == 1:
        return datagen.random_keys(jax.random.key(seed), n, "uint32")
    return datagen.entropy_keys(jax.random.key(seed), n, e, "uint32")


def _gen_planes(n: int, entropy, seed: int = 0):
    """u64 keys as (hi, lo) planes: per-plane AND of k draws equals the
    64-bit AND-entropy ladder (independent words)."""
    if entropy == "zipf":
        lo = datagen.zipf_keys(jax.random.key(seed), n, alpha=1.1,
                               dtype=jnp.uint32)
        hi = jnp.zeros_like(lo)  # zipf ranks fit 32 bits; hi plane ties
        return hi, lo
    e = int(entropy)
    if e == 0:
        z = jnp.zeros((n,), jnp.uint32)
        return z, z
    hi = datagen.entropy_keys(jax.random.key(2 * seed + 1), n, e, "uint32") \
        if e > 1 else datagen.random_keys(jax.random.key(2 * seed + 1), n,
                                          "uint32")
    lo = datagen.entropy_keys(jax.random.key(2 * seed + 2), n, e, "uint32") \
        if e > 1 else datagen.random_keys(jax.random.key(2 * seed + 2), n,
                                          "uint32")
    return hi, lo


def verify_keys(keys, got) -> bool:
    """Bit-pattern comparison vs the reference engine — exact for every
    dtype incl. float32 NaNs (array_equal on float values would reject a
    correct sort: NaN != NaN, and entropy-AND bit patterns produce them)."""
    want = jax.jit(lambda k: tpusort.sort(k, algorithm="reference"))(keys)
    return bool(jnp.array_equal(got.view(jnp.uint32), want.view(jnp.uint32)))


def verify_planes(hi, lo, ghi, glo, key_dtype="uint64") -> bool:
    whi, wlo = jax.jit(lambda h, l: tpusort.sort_planes(
        (h, l), key_dtype=key_dtype, algorithm="reference"))(hi, lo)
    return bool(jnp.array_equal(ghi, whi) and jnp.array_equal(glo, wlo))


def verify_pairs(keys, gk, gv) -> bool:
    """Unstable pair semantics (test_sort_pairs.cu): output keys sorted,
    values a permutation of the enumeration, and every (key, value) pair
    bound to its origin."""
    n = keys.shape[0]
    ks = np.asarray(keys)
    gk, gv = np.asarray(gk), np.asarray(gv)
    if not np.all(np.diff(gk.astype(np.int64)) >= 0):
        return False
    if gv.max(initial=0) >= n or np.unique(gv).size != n:
        return False
    return bool(np.array_equal(ks[gv], gk))


def main():
    timing.honor_explicit_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("-k", "--num-keys", type=int, default=1 << 24)
    ap.add_argument("-r", "--repeats", type=int, default=1)
    ap.add_argument("--algorithm", default="auto")
    ap.add_argument("--types", nargs="+",
                    default=["uint32", "uint64", "float32"])
    ap.add_argument("--pairs", action="store_true",
                    help="add a u32 keys + u32 payload row set")
    ap.add_argument("--stable", action="store_true",
                    help="stable pair semantics (default unstable)")
    ap.add_argument("--entropies", nargs="+",
                    default=["1", "2", "4", "8", "0", "zipf"])
    ap.add_argument("--no-verify", action="store_true")
    ap.add_argument("--csv")
    args = ap.parse_args()

    n = args.num_keys
    prof = Profile(f"entropy_matrix_{args.algorithm}")

    # --pairs ADDS the pairs row set to the type rows (as the help text
    # says); --types pairs alone runs just the pairs rows
    rows = [(t, None) for t in args.types if t != "pairs"]
    if args.pairs or "pairs" in args.types:
        rows.append(("pairs", None))

    def _flush():
        # incremental CSV: a timeout/tunnel death keeps the finished rows
        if args.csv:
            with open(args.csv, "w") as f:
                f.write(prof.csv())

    for dtype, _ in rows:
        for entropy in args.entropies:
            _flush()
            if dtype in ("uint64", "int64", "float64"):
                # 64-bit rows run through the plane interface (this
                # backend cannot materialize 64-bit arrays); entropy-AND
                # bit patterns double as the float64 NaN/denormal stress
                hi, lo = _gen_planes(n, entropy)
                fn = lambda h, l, _d=dtype: tpusort.sort_planes(
                    (h, l), key_dtype=_d, algorithm=args.algorithm)
                with prof.run(dtype=dtype, entropy=entropy,
                              num_keys=n) as r:
                    dt = timing.measure_eager(fn, hi, lo,
                                              iters=args.repeats)
                    r.set_metric("sort_ms", dt * 1e3)
                    r.set_metric("mkeys_per_s", n / dt / 1e6)
                    if not args.no_verify:
                        ghi, glo = fn(hi, lo)
                        r.set_metric("verified", verify_planes(
                            hi, lo, ghi, glo, dtype))
            elif dtype == "pairs":
                keys = _gen_u32(n, entropy)
                vals = jnp.arange(n, dtype=jnp.uint32)
                fn = lambda k, v: tpusort.sort(
                    k, v, algorithm=args.algorithm, stable=args.stable)
                with prof.run(dtype="u32pairs", entropy=entropy,
                              num_keys=n) as r:
                    dt = timing.measure_eager(fn, keys, vals,
                                              iters=args.repeats)
                    r.set_metric("sort_ms", dt * 1e3)
                    r.set_metric("mpairs_per_s", n / dt / 1e6)
                    if not args.no_verify:
                        gk, gv = fn(keys, vals)
                        ok = verify_pairs(keys, gk, gv)
                        if args.stable:
                            wk, wv = jax.jit(lambda k, v: tpusort.sort(
                                k, v, algorithm="reference"))(keys, vals)
                            ok = ok and bool(jnp.array_equal(gv, wv))
                        r.set_metric("verified", ok)
            else:
                if entropy == "zipf" and dtype != "uint32":
                    continue
                keys = (
                    _gen_u32(n, entropy) if dtype == "uint32"
                    else datagen.random_keys(jax.random.key(0), n, dtype)
                    if entropy == "1"
                    else datagen.entropy_keys(jax.random.key(0), n,
                                              int(entropy), dtype)
                )
                fn = lambda k: tpusort.sort(k, algorithm=args.algorithm)
                with prof.run(dtype=dtype, entropy=entropy,
                              num_keys=n) as r:
                    dt = timing.measure_eager(fn, keys,
                                              iters=args.repeats)
                    r.set_metric("sort_ms", dt * 1e3)
                    r.set_metric("mkeys_per_s", n / dt / 1e6)
                    if not args.no_verify:
                        r.set_metric("verified", verify_keys(keys, fn(keys)))

    print(prof.table())
    _flush()
    if args.csv:
        print(f"csv written to {args.csv}")


if __name__ == "__main__":
    main()
