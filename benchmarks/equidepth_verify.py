"""Equidepth on-chip verification driver: stage-by-stage e2e exactness.

Runs the splitter pipeline stage by stage (separate, smaller compiles -
the monolithic jit compiles every Mosaic kernel in one program) over
uniform / zipf / presorted / entropy-reduced inputs and checks exactness
and the overflow flag on the real chip."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")
import time, jax, jax.numpy as jnp, numpy as np
from tpusort.ops import msd, equidepth
from tpusort import dtypes as td
from tpusort.kernels.partition import partition_pass_fused
from tpusort.kernels.bitonic import sort_tiles_counts
from tpusort.kernels.collapse import collapse_segments
from tpusort.utils import datagen

N = 1 << 26

def run_eq(keys):
    planes, _ = td.twiddle_in(keys)
    n = keys.shape[0]
    kwargs, _, sample_log2, m_sample, leaf_max = equidepth._prepare(n, None)
    plan = msd.plan_msd(n, 0, 32, **kwargs)
    plan = equidepth._widen_last(plan, n, m_sample, leaf_max)
    p = len(plan.passes); r = plan.passes[0].r
    t0 = time.time()
    # planes (a sequence) since the multi-plane refactor, matching the
    # engine's own call (equidepth.py sort_twiddled_equidepth)
    q = equidepth._quantile_table(planes, n, r**p - 1,
                                  sample_log2=sample_log2)
    jax.block_until_ready(q.q); print("  qtable", round(time.time()-t0, 1), flush=True)
    k0 = plan.passes[0].k
    t1 = plan.m1 // k0
    padded = jnp.pad(planes[0], (0, plan.m1 - n))
    a_mix = 1 << ((t1.bit_length() - 1) // 2)
    b_mix = t1 // a_mix
    t_idx = jnp.arange(t1, dtype=jnp.int32)
    strided = padded.reshape(k0, b_mix, a_mix).transpose(2, 1, 0).reshape(-1)
    mixvec = (t_idx % b_mix) * a_mix + t_idx // b_mix
    qg = 128
    thr = (n - mixvec + t1 - 1) // t1
    c0 = jnp.clip(thr[:, None] - jnp.arange(k0 // qg,
                  dtype=jnp.int32)[None, :] * qg, 0, qg)
    ops = [strided]; ctable = c0.reshape(-1); prev_s = None
    overflow = False
    for j, spec in enumerate(plan.passes):
        t = spec.n_seg * spec.t_seg
        tiled = [o.reshape(t, spec.k) for o in ops]
        spl, frac = equidepth._pass_splitters(q, p, j, r, spec.t_seg)
        cin = ctable.reshape(t, spec.k // qg)
        data, counts = partition_pass_fused(
            tiled, [], cin, q_in=qg, r=spec.r, s=spec.s,
            lo_bit=spec.lo_bit, width=spec.width,
            sorted_run=(None if prev_s is None else (prev_s & -prev_s)),
            t_seg=spec.t_seg, splitters=spl, splitter_fracs=frac)
        overflow |= bool(jnp.any(counts > spec.s))
        print(f"  pass{j}", round(time.time()-t0, 1), flush=True)
        qg = spec.s & -spec.s
        c = jnp.minimum(counts, spec.s).reshape(
            spec.n_seg, spec.t_seg, spec.r).transpose(0, 2, 1)
        c = jnp.clip(c[..., None] - jnp.arange(spec.s // qg,
                                               dtype=jnp.int32) * qg, 0, qg)
        ctable = c.reshape(-1)
        prev_s = spec.s
        ops = data
    pack = 1
    while (pack * 2 * plan.seg <= (1 << 15)
           and plan.n_segments % (pack * 2) == 0):
        pack *= 2
    nt = plan.n_segments // pack
    tile = pack * plan.seg
    ct = ctable.reshape(nt, tile // qg)
    so = sort_tiles_counts([o.reshape(nt, tile) for o in ops], ct, qg,
                           sorted_run=(prev_s & -prev_s))
    tc = ct.sum(axis=1, dtype=jnp.int32)
    out = collapse_segments(so, tc, n)
    print("  leaf+collapse", round(time.time()-t0, 1), "overflow:", overflow,
          flush=True)
    return np.asarray(out[0])

for name, keys in (
    ("uniform", jax.random.bits(jax.random.key(0), (N,), dtype=jnp.uint32)),
    ("zipf", datagen.zipf_keys(jax.random.key(3), N, alpha=1.1,
                               dtype=jnp.uint32)),
    ("presorted", jnp.sort(jax.random.bits(jax.random.key(4), (N,),
                                           dtype=jnp.uint32))),
    ("entropy2", datagen.entropy_keys(jax.random.key(1), N, 2, "uint32")),
):
    got = run_eq(keys)
    ok = np.array_equal(got, np.sort(np.asarray(keys)))
    print(f"{name}: exact={'OK' if ok else 'MISMATCH'}", flush=True)
