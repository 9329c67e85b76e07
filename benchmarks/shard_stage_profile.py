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
    ap.add_argument("--finish", default="both",
                    choices=["collapse", "windows", "both"],
                    help="post-shuffle finish variant(s) to profile: the "
                         "r4 collapse+full-sort, the r5 sorted-window "
                         "emit-only-pass-0 pipeline, or both")
    args = ap.parse_args()

    n_shard = 1 << args.log2n_shard
    d = args.d
    quantum = (1 << 16) if args.finish in ("windows", "both") else 128
    capacity = _capacity_for(n_shard, d, args.capacity_factor, args.chunks,
                             quantum=quantum)
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

    t_finish = None
    if args.finish in ("collapse", "both"):
        t_finish = bench("engine_finish_normalized", finish_normalized,
                         narrow, *vals, overhead=overhead)
        bench("engine_finish_raw_narrow (fallback path)", local_sort,
              narrow, *vals, overhead=overhead)

    # 4w) r5 sorted-window finish: the received padded windows — each a
    # SORTED monotone slice of a locally sorted shard — feed the engine
    # pipeline directly (validity chain seeded from window counts, pass 0
    # emit-only, no collapse).  Prep (untimed): build d realistic
    # windows by deinterleaving a sorted narrow-range shard.
    t_windows = None
    if args.finish in ("windows", "both"):
        from tpusort import configs as _cfgs
        from tpusort.ops.msd import sort_windows_msd

        cnt = n_shard // d
        s_sorted = jnp.sort(narrow)
        wins = [jax.lax.slice(s_sorted, (w,), (n_shard,), (d,))
                for w in range(d)]
        pad = jnp.zeros((capacity - cnt,), jnp.uint32)
        flat = jnp.concatenate(
            [jnp.concatenate([w_, pad]) for w_ in wins])
        wcounts = jnp.full((d,), cnt, jnp.int32)
        vwins = ()
        if args.pairs:
            vflat = jax.random.bits(jax.random.key(9),
                                    (d * capacity,), dtype=jnp.uint32)
            vwins = (vflat,)
        fin_kwargs = {
            kk: vv for kk, vv in
            _cfgs.get_config(32, args.pairs, "tpu").plan_kwargs().items()
            if kk != "min_n"
        }

        def finish_windows(f, *v):
            kn = (f - jnp.uint32(base)) << jnp.uint32(sh)
            res = sort_windows_msd(
                (kn,), v, window_counts=wcounts, window=capacity,
                n=n_shard, total_bits=32, plan_kwargs=fin_kwargs,
            )
            assert res is not None, "no windows plan at this geometry"
            ops, ovf = res
            return [(ops[0] >> jnp.uint32(sh)) + jnp.uint32(base)] \
                + list(ops[1:]) + [ovf]

        t_windows = bench("engine_finish_windows", finish_windows, flat,
                          *vwins, overhead=overhead, capacity=capacity)
        outw = jax.jit(finish_windows)(flat, *vwins)
        okw = jax.jit(
            lambda o, s: (jnp.all(o[1:] >= o[:-1])
                          & jnp.array_equal(o, s)
                          & ~outw[-1].astype(bool))
        )(outw[0], s_sorted)
        print(json.dumps({"stage": "windows_verified",
                          "ok": bool(np.asarray(okw))}))

    shuffle_bytes = capacity * d * 4 * n_ops
    row = {
        "stage": "bound",
        "shuffle_bytes_per_shard": int(shuffle_bytes),
        "chunks": args.chunks,
        "capacity": capacity,
    }
    variants = []
    if t_finish is not None:
        variants.append(("collapse", t_sort + t_expand + t_collapse
                         + t_finish))
    if t_windows is not None:
        variants.append(("windows", t_sort + t_expand + t_windows))
    for name, t_local in variants:
        row[f"{name}_local_stages_ms"] = round(t_local * 1e3, 2)
        for bw in (45e9, 90e9, 186e9):   # v5e ICI per-link scenarios
            t_sh = shuffle_bytes / bw
            t_step = t_local + max(t_sh, t_expand / args.chunks)
            row[f"{name}_step_ms_at_{int(bw/1e9)}GBps"] = round(
                t_step * 1e3, 2)
            row[f"{name}_keys_per_s_per_chip_at_{int(bw/1e9)}GBps"] = int(
                n_shard / t_step)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
