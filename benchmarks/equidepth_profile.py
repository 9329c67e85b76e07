"""Per-stage timing of the equi-depth (skew tier) pipeline on the chip.

VERDICT r3 weak #3: skewed inputs run at ~half the uniform rate through
the equi-depth tier.  This driver attributes the gap: quantile table
(sample sort + scans), strided tile assignment, splitter passes, leaf.

Run from the repo root:
  python benchmarks/equidepth_profile.py [--log2n 28] [--entropy 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np

from tpusort.configs import get_config
from tpusort.ops import equidepth as eq
from tpusort.ops import msd as _msd
from tpusort.utils.datagen import entropy_keys


@jax.jit
def _probe(o):
    return jax.tree.leaves(o)[0].ravel()[:8]


def _sync(out):
    return np.asarray(_probe(out))


def bench(name, fn, *args, iters=2):
    f = jax.jit(fn)
    _sync(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(ts)*1e3:9.2f} ms", flush=True)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=28)
    ap.add_argument("--entropy", type=int, default=2)
    args = ap.parse_args()
    n = 1 << args.log2n

    keys = entropy_keys(jax.random.key(0), n, args.entropy)
    cfg = get_config(32, False, "tpu")
    plan_kwargs = cfg.plan_kwargs()
    kwargs, min_n, sample_log2, m_sample, leaf_max = eq._prepare(
        n, plan_kwargs)
    plan = _msd.plan_msd(n, 0, 32, **kwargs)
    plan = eq._widen_last(plan, n, m_sample, leaf_max)
    print("plan:", [(p.n_seg, p.t_seg, p.k, p.r, p.s) for p in plan.passes],
          "seg", plan.seg, "m_sample", m_sample, flush=True)
    nq = plan.passes[0].r ** len(plan.passes) - 1

    bench("noop", lambda a: a, keys[:8])
    bench("quantile table (sample sort + scans)",
          lambda k: jax.tree.leaves(
              eq._quantile_table((k,), n, nq).q)[0],
          keys)

    def _tbl(k):
        t = eq._quantile_table((k,), n, nq)
        return t.q[0], t.lo, t.hi
    tq, tlo, thi = jax.jit(_tbl)(keys)
    # static rank table mirrors _quantile_table's own construction
    target = max(1 << 16, min(eq._SAMPLE_CAP, n // 8))
    stride = max(1, n // target)
    m = -(-n // stride)
    ranks = np.fromiter(
        (min(i * m // (nq + 1), m - 1) for i in range(1, nq + 1)),
        dtype=np.int32, count=nq)
    table = eq._EqTable([tq], tlo, thi, ranks, m)

    # strided tile assignment alone
    k0 = plan.passes[0].k
    t1 = plan.m1 // k0

    def strided(k):
        o = jnp.pad(k, (0, plan.m1 - n))
        a_mix = 1 << ((t1.bit_length() - 1) // 2)
        b_mix = t1 // a_mix
        if a_mix * b_mix == t1:
            return o.reshape(k0, b_mix, a_mix).transpose(2, 1, 0).reshape(-1)
        return o.reshape(k0, t1).T.reshape(-1)

    bench("strided tile assignment (element transpose)", strided, keys)

    def pipeline(k, tq, tlo, thi):
        # ranks/m are static (closure) — _pass_splitters does host math
        tbl = eq._EqTable([tq], tlo, thi, ranks, m)
        out, ovf = eq._run_pipeline((k,), (), n, plan, tbl, None,
                                    batch=cfg.pass_batch)
        return out[0], ovf

    t_pipe = bench("splitter passes + leaf + collapse", pipeline, keys,
                   table.q[0], table.lo, table.hi)

    def full(k):
        sp, _, ovf = eq.sort_twiddled_equidepth(
            (k,), (), begin_bit=0, end_bit=32, total_bits=32,
            on_overflow="flag", config=cfg)
        return sp[0], ovf

    bench("full equidepth engine (flag mode)", full, keys)
    out, ovf = jax.jit(full)(keys)
    print("overflow:", bool(np.asarray(jax.jit(lambda o: o)(ovf))),
          flush=True)
    o = np.asarray(out)
    print("sorted:", bool(np.all(o[1:] >= o[:-1])), flush=True)


if __name__ == "__main__":
    main()
