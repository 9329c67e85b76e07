"""Headline benchmark: 32-bit keys/s on one chip.

Workload mirrors the reference's benchmarks (2^28 uniform 32-bit keys,
``msb/src/test.cu:64``; the LSB driver's 2^28-item trials,
``lsb/sort.cu:87-131``) and BASELINE.json config #2.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is against the 2B keys/s/chip north-star target.

Timing discipline: block_until_ready does not block on the tunneled axon
backend, so completion is forced by fetching a tiny probe slice through a
separate jit boundary; dispatch+probe overhead is measured with a no-op and
subtracted (see DESIGN.md).
"""

from __future__ import annotations

import argparse
import json
import os
import time

# persistent compile cache: the big fused kernels take 60s+ (sometimes much
# longer on the remote-compile service) — pay it once across processes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np

import tpusort

TARGET_KEYS_PER_S = 2.0e9  # BASELINE.json north star, per chip


def _mix(x):
    """splitmix32 finalizer: order-independent multiset fingerprint."""
    x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x846CA68B)
    return x ^ (x >> jnp.uint32(16))


def _checks(k_out, k_in, v_out=None, v_in=None, stable=False):
    """In-graph result verification (uint32 sums wrap mod 2^32):
    sortedness, key-multiset fingerprints, (key,value)-pair-binding
    fingerprint, and stability of enumerated values."""
    ok = jnp.all(k_out[1:] >= k_out[:-1])
    ok &= jnp.sum(_mix(k_out)) == jnp.sum(_mix(k_in))
    ok &= jnp.sum(k_out) == jnp.sum(k_in)
    if v_out is not None:
        ok &= jnp.sum(_mix(k_out ^ _mix(v_out))) == jnp.sum(
            _mix(k_in ^ _mix(v_in)))
        if stable:
            ok &= jnp.all((k_out[1:] != k_out[:-1])
                          | (v_out[1:] > v_out[:-1]))
    return ok


@jax.jit
def _probe(o):
    return jax.tree.map(lambda a: a.ravel()[:8], o)


def _sync(out):
    return np.asarray(jax.tree.leaves(_probe(out))[0])


def _time(fn, *args, iters=3, warmup=1):
    _sync(fn(*args))  # compile
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    from tpusort.utils import timing as _timing

    _timing.honor_explicit_cpu()

    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=28)
    ap.add_argument("--algorithm", default="auto")
    ap.add_argument("--pairs", action="store_true")
    ap.add_argument("--unstable", action="store_true",
                    help="unstable pair semantics (reference MSB parity)")
    ap.add_argument("--verify", action="store_true",
                    help="in-graph verification after timing: sortedness + "
                         "multiset checksums vs the input (on-chip, no "
                         "full D2H; catches miscompiles hiding behind "
                         "plausible timings)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--meminfo", action="store_true",
                    help="compile only and print the XLA memory analysis "
                         "(peak HBM for the timed computation) instead of "
                         "running — diagnoses RESOURCE_EXHAUSTED at 2^30")
    args = ap.parse_args()

    n = 1 << args.log2n
    if args.meminfo:
        global _time

        def _time(fn, *a, iters=0, warmup=0):  # noqa: F811
            ma = fn.lower(*a).compile().memory_analysis()
            print(json.dumps({
                "log2n": args.log2n,
                "peak_gb": round(getattr(ma, "temp_size_in_bytes", 0) / 2**30, 3),
                "args_gb": round(getattr(ma, "argument_size_in_bytes", 0) / 2**30, 3),
                "out_gb": round(getattr(ma, "output_size_in_bytes", 0) / 2**30, 3),
                "alias_gb": round(getattr(ma, "alias_size_in_bytes", 0) / 2**30, 3),
            }))
            raise SystemExit(0)

    overhead = 0.0 if args.meminfo else _time(
        jax.jit(lambda a: a), jnp.zeros((8,), jnp.uint32), iters=args.iters)

    # At 2^30 the held input buffer (4.3 GB) plus the pipeline's in+out
    # pass buffers (2 x 1.5n x 4B) exceed HBM; generating keys inside the
    # jitted step lets XLA free them after pass 0 consumes them.  Threefry
    # itself holds ~5 temporaries of n x 4B, so huge sizes use a splitmix32
    # finalizer over iota (2 temps, full avalanche) instead.
    gen_inside = args.log2n >= 30

    def _hash_keys(seed):
        z = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(seed) * jnp.uint32(0x9E3779B9)
        z = (z ^ (z >> jnp.uint32(16))) * jnp.uint32(0x45D9F3B)
        z = (z ^ (z >> jnp.uint32(16))) * jnp.uint32(0x45D9F3B)
        return z ^ (z >> jnp.uint32(16))

    verify_fn = None
    verify_args = ()
    big_flag_mode = (
        not args.pairs
        and gen_inside
        and args.algorithm in ("auto", "msd", "lsd")
    )
    if big_flag_mode:
        # >2^29: the in-graph cond fallback would reserve the reference
        # sort's workspace on top of the pipeline (OOM); flag mode runs the
        # full pipeline and the HOST owns the fallback decision.  Keys are
        # generated in-graph so the pipeline's pass buffers are the only
        # big live set.
        from tpusort import dtypes as _td
        from tpusort.configs import get_config as _get_config
        from tpusort.ops.msd import sort_twiddled_msd as _msd_sort

        # thread the registered tuning config through so this path compiles
        # the same plan geometry the public API would
        _cfg = _get_config(32, False)

        def fn(seed):
            k = _hash_keys(seed)
            planes, traits = _td.twiddle_in(k)
            sp, _, ovf = _msd_sort(
                planes, (), begin_bit=0, end_bit=32, total_bits=32,
                on_overflow="flag", config=_cfg,
            )
            return _td.twiddle_out(sp, traits, dtype=k.dtype), ovf

        jfn = jax.jit(fn)
        dt = _time(jfn, 0, iters=args.iters) - overhead
        held, ovf = jfn(0)          # one run binds both outputs
        if bool(ovf):
            # pathological distribution: report (and verify) the honest
            # exact path the host-side fallback decision selects
            def ref(s):
                return tpusort.sort(_hash_keys(s), algorithm="reference")
            jref = jax.jit(ref)
            dt = _time(jref, 0, iters=args.iters) - overhead
            held = jref(0)
        # verify the HELD device output with a checks-only graph — embedding
        # the sort in the verify graph would recompile the whole pipeline
        # (the r3 2^30 --verify stall: a second 2^30 pipeline compile)
        verify_fn = jax.jit(lambda out, s: _checks(out, _hash_keys(s)))
        verify_args = (held, 0)
        metric = "keys_per_sec_per_chip"
    elif args.pairs:
        def _vrfy_out(gk, gv, k, v):
            return _checks(gk, k, gv, v, stable=not args.unstable)

        if gen_inside:
            def fn(seed):
                k = _hash_keys(seed)
                v = jnp.arange(n, dtype=jnp.uint32)
                return tpusort.sort(k, v, algorithm=args.algorithm,
                                    stable=not args.unstable)
            jfn = jax.jit(fn)
            dt = _time(jfn, 0, iters=args.iters) - overhead
            hk, hv = jfn(0)
            verify_fn = jax.jit(lambda gk, gv, s: _vrfy_out(
                gk, gv, _hash_keys(s), jnp.arange(n, dtype=jnp.uint32)))
            verify_args = (hk, hv, 0)
        else:
            keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
            vals = jnp.arange(n, dtype=jnp.uint32)
            fn = jax.jit(
                lambda k, v: tpusort.sort(
                    k, v, algorithm=args.algorithm, stable=not args.unstable
                )
            )
            dt = _time(fn, keys, vals, iters=args.iters) - overhead
            hk, hv = fn(keys, vals)
            verify_fn = jax.jit(_vrfy_out)
            verify_args = (hk, hv, keys, vals)
        metric = "pairs_per_sec_per_chip"
    else:
        if gen_inside:
            def fn(seed):
                return tpusort.sort(_hash_keys(seed),
                                    algorithm=args.algorithm)
            jfn = jax.jit(fn)
            dt = _time(jfn, 0, iters=args.iters) - overhead
            held = jfn(0)
            verify_fn = jax.jit(lambda out, s: _checks(out, _hash_keys(s)))
            verify_args = (held, 0)
        elif args.log2n <= 24:
            # small sizes: one sort is shorter than the host<->device sync
            # (~28 ms on the tunneled backend), so amortize REPS sequenced
            # sorts of distinct inputs inside one jitted scan
            reps = max(4, (1 << 26) // n)

            def fn(_):
                def body(acc, i):
                    k = _hash_keys(i) + acc
                    out = tpusort.sort(k, algorithm=args.algorithm)
                    return out[0], ()
                acc, _ = jax.lax.scan(
                    body, jnp.uint32(0), jnp.arange(reps, dtype=jnp.uint32)
                )
                return acc
            dt = (_time(jax.jit(fn), 0, iters=args.iters) - overhead) / reps
        else:
            keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
            fn = jax.jit(lambda k: tpusort.sort(k, algorithm=args.algorithm))
            dt = _time(fn, keys, iters=args.iters) - overhead
            held = fn(keys)
            verify_fn = jax.jit(_checks)
            verify_args = (held, keys)
        metric = "keys_per_sec_per_chip"

    dt = max(dt, 1e-9)
    value = n / dt
    row = {
        "metric": metric,
        "value": round(value),
        "unit": "pairs/s" if args.pairs else "keys/s",
        "vs_baseline": round(value / TARGET_KEYS_PER_S, 4),
    }
    if args.verify:
        row["verified"] = (
            bool(np.asarray(verify_fn(*verify_args)))
            if verify_fn is not None else None  # scan branch: no plain output
        )
    print(json.dumps(row))


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except Exception as e:
        # The tunneled backend wedges transiently ("TPU backend error
        # (Internal)", probe hangs); a poisoned PJRT client cannot recover
        # in-process, so re-exec a fresh interpreter after a cooldown.
        import sys
        import time as _t

        tries = int(os.environ.get("TPUSORT_BENCH_RETRY", "0"))
        if tries >= 2:
            raise
        print(
            f"bench attempt {tries + 1} failed ({type(e).__name__}: {e}); "
            "re-exec after 120s",
            file=sys.stderr,
        )
        _t.sleep(120)
        os.environ["TPUSORT_BENCH_RETRY"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
