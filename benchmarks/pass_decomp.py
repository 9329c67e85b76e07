"""Decompose the fused partition pass's cost at the adopted geometry.

VERDICT r3 #1: the cost model says ~1.15-1.2 G keys/s at 2^28 for the
big-tile plan; measured is 873 M.  pipeline_profile shows each pass runs
~30-40 ms over the bare-network model — this probe attributes that gap by
running kernel variants that each add one ingredient:

  net        valid mask + garbage rewrite + (transposed) sort/merge network,
             sorted tile written back contiguously
  starts     + the 31 compare-reduce run boundaries (and SMEM counts row)
  emit       + the scratch copy + 32 dynamic-start run slices, tile-major out
  exchanged  + the fused digit-major 5-D output BlockSpec (production kernel)

Run from the repo root: python benchmarks/pass_decomp.py [--log2n 28]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusort.kernels.bitonic import (
    LANES, _merge_sorted_runs, _sort_network, _t_layout_ok, _valid_from,
)
from tpusort.kernels.partition import _dynamic_run_slice, partition_pass_fused


def _variant_kernel(*refs, mode: str, nb: int, r: int, s: int, k: int,
                    n, sorted_run: int, exchanged: bool):
    ins = refs[0:1]
    outs_start = 1
    counts_ref = None
    if mode in ("starts", "emit", "exchanged"):
        counts_ref = refs[-1 - (1 if mode in ("emit", "exchanged") else 0)]
    rows = k // LANES
    valid = _valid_from(None, 0, nb, rows, k, n)
    kp = jnp.where(valid, ins[0][...], jnp.uint32(0xFFFFFFFF))
    t_lay = _t_layout_ok(rows)
    ops_net = [kp]
    if t_lay:
        ops_net = [jnp.swapaxes(a, -1, -2) for a in ops_net]
    if mode == "copy":
        # no network: isolates valid+rewrite+transposes+HBM round trip
        sorted_all = ops_net
    elif sorted_run:
        sorted_all = _merge_sorted_runs(ops_net, sorted_run, num_keys=1,
                                        t_layout=t_lay)
    else:
        sorted_all = _sort_network(ops_net, num_keys=1, t_layout=t_lay)
    if t_lay:
        sorted_all = [jnp.swapaxes(a, -1, -2) for a in sorted_all]
    if mode == "copy":
        refs[1][...] = sorted_all[0]
        return

    if mode == "net":
        refs[1][...] = sorted_all[0]
        return

    n_valid = [jnp.sum(valid[b].astype(jnp.int32)) for b in range(nb)]
    starts = []
    counts = []
    for b in range(nb):
        st = [jnp.int32(0)]
        for d in range(1, r):
            st.append(jnp.sum(
                (sorted_all[0][b] < jnp.uint32(d << 27)).astype(jnp.int32)))
        cn = [st[d + 1] - st[d] for d in range(r - 1)]
        cn.append(n_valid[b] - st[r - 1])
        starts.append(st)
        counts.append(cn)

    if mode == "starts":
        refs[1][...] = sorted_all[0]
        for b in range(nb):
            for d in range(r):
                counts_ref[b, 0, d] = counts[b][d]
        return

    # emit / exchanged: scratch copy + dynamic run slices
    out = refs[1]
    scratch = refs[-1]
    srows = s // LANES
    for b in range(nb):
        scratch[b, :rows] = sorted_all[0][b]
    for b in range(nb):
        for d in range(r):
            run = _dynamic_run_slice(scratch.at[b], starts[b][d], srows)
            if exchanged:
                out[0, d, b] = run
            else:
                out[b, d * srows:(d + 1) * srows] = run
            counts_ref[b, 0, d] = counts[b][d]


def run_variant(keys, mode, *, k, r, s, nb, n, sorted_run=0, t_seg=None):
    T = keys.shape[0] // k
    rows = k // LANES
    srows = s // LANES
    shaped = keys.reshape(T, rows, LANES)
    in_specs = [pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM)]
    scratch = []
    if mode in ("copy", "net", "starts"):
        out_shape = [jax.ShapeDtypeStruct((T, rows, LANES), jnp.uint32)]
        out_specs = [pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                                  memory_space=pltpu.VMEM)]
    elif mode == "emit":
        out_shape = [jax.ShapeDtypeStruct((T, r * srows, LANES), jnp.uint32)]
        out_specs = [pl.BlockSpec((nb, r * srows, LANES),
                                  lambda t: (t, 0, 0),
                                  memory_space=pltpu.VMEM)]
        scratch = [pltpu.VMEM((nb, rows + srows + 1, LANES), jnp.uint32)]
    else:  # exchanged
        n_seg = T // t_seg
        tb = t_seg // nb
        out_shape = [jax.ShapeDtypeStruct((n_seg, r, t_seg, srows, LANES),
                                          jnp.uint32)]
        out_specs = [pl.BlockSpec((1, r, nb, srows, LANES),
                                  lambda t: (t // tb, 0, t % tb, 0, 0),
                                  memory_space=pltpu.VMEM)]
        scratch = [pltpu.VMEM((nb, rows + srows + 1, LANES), jnp.uint32)]
    if mode in ("starts", "emit", "exchanged"):
        out_shape.append(jax.ShapeDtypeStruct((T, 1, r), jnp.int32))
        out_specs.append(pl.BlockSpec((nb, 1, r), lambda t: (t, 0, 0),
                                      memory_space=pltpu.SMEM))
    return pl.pallas_call(
        functools.partial(_variant_kernel, mode=mode, nb=nb, r=r, s=s, k=k,
                          n=n, sorted_run=sorted_run,
                          exchanged=(mode == "exchanged")),
        out_shape=out_shape,
        grid=(T // nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=jax.default_backend() != "tpu",
    )(shaped)


@jax.jit
def _probe(o):
    return jax.tree.leaves(o)[0].ravel()[:8]


def _sync(out):
    return np.asarray(_probe(out))


def bench(name, fn, *args, iters=3):
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
    ap.add_argument("--nb", type=int, default=2)
    ap.add_argument("--merge", action="store_true",
                    help="pass-1 shape: merge from sorted_run=512")
    args = ap.parse_args()
    n = 1 << args.log2n
    K, R, S = 1 << 16, 32, 2560
    T = n // K
    t_seg = T  # pass-0 single segment
    keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
    if args.merge:
        # pre-sort 512-runs so the merge path is realistic
        keys = jnp.sort(keys.reshape(-1, 512), axis=1).reshape(-1)
    sr = 512 if args.merge else 0

    bench("noop", lambda a: a, keys[:8])
    for mode in ("copy", "net", "starts", "emit", "exchanged"):
        for nb in ([args.nb] if mode != "net" else
                   sorted({1, 2, 4, args.nb})):
            bench(f"{mode:10s} k={K} nb={nb} sr={sr}",
                  functools.partial(run_variant, mode=mode, k=K, r=R, s=S,
                                    nb=nb, n=n, sorted_run=sr,
                                    t_seg=t_seg),
                  keys)
    # production fused kernel for cross-check
    def prod(kk):
        data, counts = partition_pass_fused(
            [kk.reshape(T, K)], [], None, r=R, s=S, lo_bit=27, width=5,
            n=n, sorted_run=(sr or None), t_seg=t_seg, batch=args.nb)
        return data
    bench("production fused", prod, keys)


if __name__ == "__main__":
    main()
