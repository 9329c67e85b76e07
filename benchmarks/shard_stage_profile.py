"""On-chip profile of the distributed sort's SHARD-LOCAL stages.

The multi-chip global sort (``tpusort.parallel.global_sort``) is, per
shard: splitter selection -> local engine sort -> padded expand (d
dynamic slices) -> all_to_all -> collapse -> engine finish.  Real ICI is
not reachable from this single-chip environment, but every non-collective
stage is — so this driver times each one at true shard sizes on the real
chip and bounds the end-to-end step as

    t_step ~= t_local_stages + max(bytes_shuffle / BW_ici, t_expand / c)

(c = chunks; piece j's all_to_all only depends on piece j's slices, so
transfers overlap the remaining slicing work).  The shuffle bytes are
exact: n_shard * capacity_factor * 4B * n_operands.  Emits one JSON line
per stage plus the bound formula evaluated at representative ICI
bandwidths (v5e ring: ~45-186 GB/s/link depending on topology).

Usage: python benchmarks/shard_stage_profile.py --log2n-shard 25 --d 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np

from tpusort.kernels.collapse import collapse_segments
from tpusort.ops.msd import sort_twiddled_msd
from tpusort.parallel.global_sort import _capacity_for


@jax.jit
def _probe(o):
    return jax.tree.leaves(o)[0].ravel()[:8]


def _sync(out):
    return np.asarray(_probe(out))


def bench(name, fn, *args, iters=3, overhead=0.0, **extra):
    f = jax.jit(fn)
    _sync(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(f(*args))
        ts.append(time.perf_counter() - t0)
    dt = max(min(ts) - overhead, 1e-9)
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 2), **extra}))
    return dt


def main():
    from tpusort.utils import timing as _timing

    _timing.honor_explicit_cpu()

    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n-shard", type=int, default=25,
                    help="keys per shard (2^28 over 8 chips -> 25)")
    ap.add_argument("--d", type=int, default=8, help="shard count modeled")
    ap.add_argument("--pairs", action="store_true")
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--capacity-factor", type=float, default=1.35)
    args = ap.parse_args()

    n_shard = 1 << args.log2n_shard
    d = args.d
    capacity = _capacity_for(n_shard, d, args.capacity_factor, args.chunks)
    cap_c = capacity // args.chunks
    n_ops = 2 if args.pairs else 1

    overhead = bench("dispatch_overhead", lambda a: a,
                     jnp.zeros((8,), jnp.uint32))

    keys = jax.random.bits(jax.random.key(0), (n_shard,), dtype=jnp.uint32)
    vals = (jnp.arange(n_shard, dtype=jnp.uint32),) if args.pairs else ()

    # 1) local engine sort (pre-shuffle): keys(+values) raw path
    def local_sort(k, *v):
        sp, sv = sort_twiddled_msd(
            (k,), v, begin_bit=0, end_bit=32, total_bits=32,
            stable=False, skew_tier=False,
        )
        return sp + sv

    t_sort = bench("local_engine_sort", local_sort, keys, *vals,
                   overhead=overhead, n=n_shard)

    # 2) padded expand: d dynamic slices per operand out of the padded
    #    sorted buffer (the send-side cost of the shuffle), per chunk piece
    starts = jnp.asarray(
        np.linspace(0, n_shard, d, endpoint=False).astype(np.int32))

    def expand(o):
        opad = jnp.concatenate([o, jnp.zeros((capacity,), o.dtype)])
        pieces = []
        for j in range(args.chunks):
            pieces.append(jnp.stack([
                jax.lax.dynamic_slice_in_dim(
                    opad, starts[b] + j * cap_c, cap_c)
                for b in range(d)
            ]))
        return pieces

    t_expand = bench("padded_expand", lambda k, *v: [expand(o)
                                                     for o in (k, *v)],
                     keys, *vals, overhead=overhead,
                     d=d, chunks=args.chunks, capacity=capacity)

    # 3) collapse: the receive side compacts d padded runs -> dense shard
    rec = [jax.random.bits(jax.random.key(7 + i), (d, capacity),
                           dtype=jnp.uint32) for i in range(n_ops)]
    seg_counts = jnp.full((d,), n_shard // d, jnp.int32)
    t_collapse = bench(
        "collapse", lambda *r: collapse_segments(list(r), seg_counts,
                                                 n_shard),
        *rec, overhead=overhead)

    # 4) engine finish on the compacted shard (post-shuffle local sort).
    #    A real shard holds a NARROW value range (its splitter bucket) —
    #    profiled honestly with range-restricted keys: raw (digit
    #    concentration -> in-graph fallback) vs the production
    #    range-normalized map ((k - base) << clz(width), global_sort r4).
    width = (1 << 32) // d
    base = np.uint32(2 * width)  # an interior shard
    narrow = (jnp.asarray(base)
              + (keys % jnp.uint32(width))).astype(jnp.uint32)
    sh = 32 - int(np.uint32(width - 1)).bit_length()

    def finish_normalized(k, *v):
        kn = (k - jnp.uint32(base)) << jnp.uint32(sh)
        sp, sv = sort_twiddled_msd(
            (kn,), v, begin_bit=0, end_bit=32, total_bits=32,
            stable=False, skew_tier=False,
        )
        return [(sp[0] >> jnp.uint32(sh)) + jnp.uint32(base)] + list(sv)

    t_finish = bench("engine_finish_normalized", finish_normalized,
                     narrow, *vals, overhead=overhead)
    bench("engine_finish_raw_narrow (fallback path)", local_sort,
          narrow, *vals, overhead=overhead)

    shuffle_bytes = n_shard * args.capacity_factor * 4 * n_ops
    t_local = t_sort + t_expand + t_collapse + t_finish
    row = {
        "stage": "bound",
        "local_stages_ms": round(t_local * 1e3, 2),
        "shuffle_bytes_per_shard": int(shuffle_bytes),
        "chunks": args.chunks,
    }
    for bw in (45e9, 90e9, 186e9):     # v5e ICI per-link scenarios
        t_sh = shuffle_bytes / bw
        t_step = t_local + max(t_sh, t_expand / args.chunks)
        row[f"step_ms_at_{int(bw/1e9)}GBps"] = round(t_step * 1e3, 2)
        row[f"keys_per_s_per_chip_at_{int(bw/1e9)}GBps"] = int(
            n_shard / t_step)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
