"""Per-stage timing of the fused MSD pipeline on the real chip.

Run from the repo root: ``python benchmarks/pipeline_profile.py [log2n]``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpusort.ops import msd
from tpusort.kernels.partition import partition_pass_fused
from tpusort.kernels.bitonic import (
    sort_tiles_counts, sort_tiles_counts_collapsed,
)
from tpusort.kernels.collapse import collapse_segments

_args = [a for a in sys.argv[1:] if a != "--log2n"]
N = 1 << (int(_args[0]) if _args else 28)


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
    print(f"{name:44s} {min(ts)*1e3:9.2f} ms")
    return f


from tpusort.configs import get_config

_kw = {k: v for k, v in get_config(32, False, "tpu").plan_kwargs().items()
       if k != "min_n"}
plan = msd.plan_msd(N, 0, 32, **_kw)
print("plan:", [(p.n_seg, p.t_seg, p.k, p.r, p.s) for p in plan.passes],
      "seg", plan.seg, "nseg", plan.n_segments, "m1", plan.m1,
      "mfinal", plan.m_final)

keys = jax.random.bits(jax.random.key(0), (N,), dtype=jnp.uint32)
bench("noop", lambda a: a, keys[:8])

ops = [jnp.pad(keys, (0, plan.m1 - N))]
ctable = None
state = (ops, ctable)
prev_s = [None]
q_hold = [None]
for i, spec in enumerate(plan.passes):
    def pass_fn(ops_, ct_, spec=spec, first=(i == 0), ps=prev_s[0],
                q=q_hold[0]):
        t = spec.n_seg * spec.t_seg
        tiled = [o.reshape(t, spec.k) for o in ops_]
        cin = None if first else ct_.reshape(t, spec.k // q)
        data, counts = partition_pass_fused(
            tiled[:1], tiled[1:], cin, q_in=q, r=spec.r, s=spec.s,
            lo_bit=spec.lo_bit, width=spec.width,
            n=(N if first else None),
            sorted_run=(None if ps is None else (ps & -ps)),
            t_seg=spec.t_seg)
        qn = spec.s & -spec.s
        chunks = spec.s // qn
        c = jnp.minimum(counts, spec.s).reshape(
            spec.n_seg, spec.t_seg, spec.r).transpose(0, 2, 1)
        c = jnp.clip(c[..., None] - jnp.arange(chunks, dtype=jnp.int32) * qn,
                     0, qn)
        return data, c.reshape(-1)
    f = bench(f"fused pass {i} (m={state[0][0].shape[0]>>20}M)",
              lambda o, m=None, _f=pass_fn: _f(o, m),
              *( (state[0], state[1]) if i else (state[0], None) ))
    state = f(*((state[0], state[1]) if i else (state[0], None)))
    prev_s[0] = spec.s
    q_hold[0] = spec.s & -spec.s

# pack cap mirrors the engine's (msd.py raw-key leaf: 1 << 15)
pack = 1
while pack * 2 * plan.seg <= (1 << 15) and plan.n_segments % (pack * 2) == 0:
    pack *= 2
nt = plan.n_segments // pack
tile = pack * plan.seg
print(f"leaf tile = {tile} (pack {pack}, nt {nt})")


def leaf_fn(ops_, ct_):
    last_s = plan.passes[-1].s
    q = last_s & -last_s
    ct = ct_.reshape(nt, tile // q)
    s = sort_tiles_counts(ops_[0].reshape(nt, tile), ct, q,
                          sorted_run=(last_s & -last_s))
    return s, ct.sum(axis=1, dtype=jnp.int32)


# production path: the engine runs the FUSED leaf+collapse kernel
# (msd.py sort_tiles_counts_collapsed); the separate rows below attribute
# its cost between the sort and the collapse write discipline


def leaf_fused_fn(ops_, ct_):
    last_s = plan.passes[-1].s
    q = last_s & -last_s
    ct = ct_.reshape(nt, tile // q)
    return sort_tiles_counts_collapsed(
        [ops_[0].reshape(nt, tile)], ct, q, N,
        sorted_run=(last_s & -last_s), num_keys=1)


bench(f"leaf+collapse fused (production, m={state[0][0].shape[0]>>20}M)",
      leaf_fused_fn, state[0], state[1])

f = bench(f"leaf raw-key separate (m={state[0][0].shape[0]>>20}M)",
          leaf_fn, state[0], state[1])
sorted_p, tile_counts = f(state[0], state[1])

bench("collapse separate",
      lambda s, c: collapse_segments([s.reshape(nt, tile)], c, N),
      sorted_p, tile_counts)
