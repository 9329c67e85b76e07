"""TPU primitive microbenchmarks.

Measures the building blocks the sort engine could be composed from, to
ground design decisions in hardware reality (the roofline discipline the
north star demands).  Run on the real TPU:

    python benchmarks/microbench.py [--quick]

Prints one JSON line per experiment and writes benchmarks/results/micro.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = {}


@jax.jit
def _probe(o):
    # tiny slice fetched to host to force full materialization of o;
    # separate jit boundary so XLA cannot DCE the producer.
    return jax.tree.map(lambda a: a.ravel()[:8], o)


def _sync(out):
    return np.asarray(jax.tree.leaves(_probe(out))[0])


def timeit(name, fn, *args, iters=5, warmup=2, bytes_moved=None, elems=None):
    """Times fn by round-tripping a tiny probe of its (fully materialized)
    output to the host; block_until_ready does not block on the tunneled
    backend.  Subtract the 'calibrate_noop' record to de-bias."""
    fn = jax.jit(fn)
    try:
        _sync(fn(*args))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"name": name, "error": str(e)[:200]}))
        RESULTS[name] = {"error": str(e)[:500]}
        return None
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rec = {"name": name, "ms": dt * 1e3}
    if elems is not None:
        rec["melems_per_s"] = elems / dt / 1e6
    if bytes_moved is not None:
        rec["GBps"] = bytes_moved / dt / 1e9
    print(json.dumps(rec))
    RESULTS[name] = rec
    return dt


def main():
    from tpusort.utils import timing as _timing

    _timing.honor_explicit_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}))

    key = jax.random.key(0)
    N = 1 << (24 if args.quick else 26)
    x = jax.random.bits(key, (N,), dtype=jnp.uint32)
    v = jnp.arange(N, dtype=jnp.uint32)

    # --- calibration: dispatch + probe round-trip cost ---
    timeit("calibrate_noop", lambda a: a, x[:8])

    # --- 0. HBM bandwidth reference: elementwise copy+add ---
    timeit("ew_add_u32", lambda a: a + jnp.uint32(1), x,
           bytes_moved=8 * N, elems=N)

    # --- 1. XLA full sort (the incumbent to beat) ---
    timeit("lax_sort_keys_u32", lambda a: jax.lax.sort(a), x, elems=N)
    timeit("lax_sort_pairs_u32",
           lambda a, b: jax.lax.sort([a, b], num_keys=1), x, v, elems=N)

    # --- 2. batched tile sorts (local phase candidate) ---
    for K in (512, 2048, 8192):
        T = N // K
        xt = x.reshape(T, K)
        vt = v.reshape(T, K)
        timeit(f"batched_sort_K{K}",
               lambda a: jax.lax.sort(a, dimension=1), xt, elems=N)
        timeit(f"batched_sort3_K{K}",
               lambda a, b: jax.lax.sort([a, a, b], dimension=1, num_keys=1),
               xt, vt, elems=N)

    # --- 3. gathers / scatters ---
    perm = jax.random.permutation(key, N).astype(jnp.int32)
    M = N // 4  # scatter/gather are expected slow; keep them affordable
    timeit("global_gather", lambda a, p: a[p], x[:M], perm[:M] % M, elems=M)
    timeit("global_scatter",
           lambda a, p: jnp.zeros_like(a).at[p].set(a), x[:M], perm[:M] % M,
           elems=M)
    K = 2048
    T = N // K
    xt = x.reshape(T, K)
    lidx = (jax.random.bits(key, (T, K), dtype=jnp.uint32) % K).astype(jnp.int32)
    timeit("batched_gather_K2048",
           lambda a, i: jnp.take_along_axis(a, i, axis=1), xt, lidx, elems=N)
    # monotonic within-tile gather (padded-expand pattern)
    sidx = jnp.sort(lidx, axis=1)
    timeit("batched_gather_monotonic_K2048",
           lambda a, i: jnp.take_along_axis(a, i, axis=1), xt, sidx, elems=N)

    # --- 4. histogram candidates (R=256) ---
    R = 256
    digit = (xt & jnp.uint32(R - 1)).astype(jnp.int32)

    def hist_onehot(d):
        oh = (d[..., None] == jnp.arange(R, dtype=jnp.int32)).astype(jnp.int32)
        return oh.sum(axis=1)

    timeit("hist_onehot_sum_K2048", hist_onehot, digit, elems=N)

    def hist_matmul(d):
        oh = (d[..., None] == jnp.arange(R, dtype=jnp.int32)).astype(jnp.bfloat16)
        ones = jnp.ones((T, 1, K), dtype=jnp.bfloat16)
        return jax.lax.dot_general(
            ones, oh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    timeit("hist_matmul_K2048", hist_matmul, digit, elems=N)

    def hist_sortsearch(d):
        sd = jax.lax.sort(d, dimension=1)
        edges = jnp.arange(R + 1, dtype=jnp.int32)
        pos = jax.vmap(lambda row: jnp.searchsorted(row, edges))(sd)
        return pos[:, 1:] - pos[:, :-1]

    timeit("hist_sort_searchsorted_K2048", hist_sortsearch, digit, elems=N)

    # segment_sum based histogram: scatter-add into (T,R)
    def hist_segsum(d):
        t_ids = jnp.arange(T, dtype=jnp.int32)[:, None] * R + d
        return jax.ops.segment_sum(jnp.ones((T, K), jnp.int32).ravel(),
                                   t_ids.ravel(), num_segments=T * R)

    timeit("hist_segment_sum_K2048", hist_segsum, digit, elems=N)

    # --- 5. scans ---
    timeit("cumsum_u32_flat", lambda a: jnp.cumsum(a), x[: 1 << 20],
           elems=1 << 20)
    h = jnp.ones((T, R), jnp.int32)
    timeit("cumsum_spine_TR", lambda a: jnp.cumsum(a.T.ravel()), h,
           elems=T * R)

    # --- 6. transpose (padded digit-major exchange candidate) ---
    S = 16
    big = x[: T * R * S // 4].reshape(T // 4, R, S)
    timeit("transpose_TRS", lambda a: a.transpose(1, 0, 2).copy(), big,
           bytes_moved=2 * big.size * 4, elems=big.size)

    # --- 7. reshape/pad roundtrip (tile framing overhead) ---
    timeit("pad_slice", lambda a: jnp.pad(a, (0, 4096))[:N], x,
           bytes_moved=8 * N, elems=N)

    os.makedirs(os.path.join(os.path.dirname(__file__), "results"), exist_ok=True)
    out_path = os.path.join(os.path.dirname(__file__), "results", "micro.json")
    with open(out_path, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(json.dumps({"written": out_path}))


if __name__ == "__main__":
    main()
