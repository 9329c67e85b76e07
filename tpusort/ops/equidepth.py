"""Equi-depth (sampled-splitter) MSD engine — the adaptive skew tier.

The radix engine's static per-digit capacities cannot absorb consistently
biased digit distributions (entropy-reduced keys, Zipfian duplication,
presorted blocks): the reference handles those with dynamic bucket→block
work queues and hot-bucket splitting
(``msb/src/sort/cuda_radix_sort.h:437-447,992-1271``), which do not map to
XLA's static shapes.  The TPU-native equivalent makes the BUCKETS adaptive:

* sample the (twiddled) input with a static stride, ``lax.sort`` the sample
  once (~2M elements), and read an equi-depth quantile table Q of R^p - 1
  splitters;
* pass j in segment g partitions against the R-1 splitters
  Q[((g*R + i) * R^(p-1-j)) - 1] — balanced buckets for ANY distribution;
* the kernel needs no digits at all: tiles are raw-key sorted (the same
  1-operand network + merge entries as the radix fast path), and range
  buckets of a sorted tile are CONTIGUOUS — the cut point for bucket d is
  clipped into the legal tie range [#keys < s_d, #keys <= s_d] by the
  static capacity, which spreads heavy values across their splitter span
  exactly (boundary-valued keys are equal across tiles, so either side of
  a cut preserves global order);
* a cut forced outside its legal range means the sample misjudged a
  bucket — the kernel poisons that tile's counts and the engine falls back
  to the exact reference sort via ``lax.cond``.

Keys-only, single-plane, full bit range (delegates otherwise).  Runs at
the radix fast path's speed on any distribution, at the cost of the
sampling prelude and 2x the per-tile cut reductions.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tpusort.ops import msd as _msd
from tpusort.ops.reference import sort_twiddled_reference

__all__ = ["sort_twiddled_equidepth", "supports"]


def supports(nplanes: int, n_values: int, begin_bit: int, end_bit: int,
             total_bits: int) -> bool:
    return (
        nplanes == 1 and n_values == 0 and begin_bit == 0
        and end_bit == total_bits == 32
    )


def _quantile_table(plane: jax.Array, n: int, nq: int,
                    sample_log2: Optional[int] = None) -> jax.Array:
    """(nq,) equi-depth splitters from a strided sample of plane[:n].

    The deepest splitter level needs low relative noise: with sample size
    m, a leaf bucket's size estimate has sigma ~ sqrt(nq/m); the static
    capacity margin is ~50%, so we take m ~ n/8 (>= 256 samples per leaf
    bucket at production geometry), sorted by the radix engine itself
    (one level of reuse, ~10-20 ms at 2^25).
    """
    if sample_log2 is None:
        target = max(1 << 16, min(1 << 25, n // 8))
    else:
        target = 1 << sample_log2
    stride = max(1, n // target)
    sample = jax.lax.slice(plane, (0,), (n,), (stride,))
    m = sample.shape[0]
    if m >= (1 << 18):
        (sample,), _ = _msd.sort_twiddled_msd(
            (sample,), (), begin_bit=0, end_bit=32, total_bits=32,
        )
    else:
        sample = jax.lax.sort(sample)
    ranks = jnp.clip(
        jnp.arange(1, nq + 1, dtype=jnp.int32) * m // (nq + 1), 0, m - 1
    )
    return sample[ranks]


def _pass_splitters(q: jax.Array, p: int, j: int, r: int,
                    t_seg: int) -> jax.Array:
    """(T_j, r-1) per-tile splitters for pass j (tiles grouped t_seg per
    segment; segment g uses Q[((g*r + i) * r^(p-1-j)) - 1])."""
    i = jnp.arange(1, r, dtype=jnp.int32)[None, :]
    g = jnp.arange(r ** j, dtype=jnp.int32)[:, None]
    stride = r ** (p - 1 - j)
    idx = (g * r + i) * stride - 1
    spl_seg = q[idx]                                   # (r^j, r-1)
    return jnp.repeat(spl_seg, t_seg, axis=0)


def sort_twiddled_equidepth(
    planes: Tuple[jax.Array, ...],
    values: Sequence[jax.Array],
    *,
    begin_bit: int,
    end_bit: int,
    total_bits: int,
    use_pallas: Optional[bool] = None,
    plan_kwargs: Optional[dict] = None,
) -> Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
    """Engine-registry entry (keys-only; delegates otherwise)."""
    n = planes[0].shape[0]
    kwargs = dict(plan_kwargs or {})
    min_n = kwargs.pop("min_n", 1 << 16)
    sample_log2 = kwargs.pop("sample_log2", None)
    if not supports(len(planes), len(values), begin_bit, end_bit,
                    total_bits) or n < min_n:
        return sort_twiddled_reference(
            planes, values, begin_bit=begin_bit, end_bit=end_bit,
            total_bits=total_bits,
        )
    plan = _msd.plan_msd(n, begin_bit, end_bit, **kwargs)
    if plan is None:
        return sort_twiddled_reference(
            planes, values, begin_bit=begin_bit, end_bit=end_bit,
            total_bits=total_bits,
        )
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    interpret = (not use_pallas) or None

    from tpusort.kernels.partition import partition_pass_fused

    p = len(plan.passes)
    r = plan.passes[0].r
    nq = r ** p - 1
    q = _quantile_table(planes[0], n, nq, sample_log2=sample_log2)

    ops = [jnp.pad(planes[0], (0, plan.m1 - n))]
    ctable = None
    qg = None
    prev_s = None
    overflow = jnp.asarray(False)
    for j, spec in enumerate(plan.passes):
        t = spec.n_seg * spec.t_seg
        tiled = [o.reshape(t, spec.k) for o in ops]
        spl = _pass_splitters(q, p, j, r, spec.t_seg)
        cin = None if ctable is None else ctable.reshape(t, spec.k // qg)
        sorted_run = None if prev_s is None else (prev_s & -prev_s)
        data, counts = partition_pass_fused(
            tiled, [], cin, q_in=qg,
            r=spec.r, s=spec.s, lo_bit=spec.lo_bit, width=spec.width,
            n=(n if ctable is None else None),
            sorted_run=sorted_run, t_seg=spec.t_seg, splitters=spl,
            interpret=interpret,
        )
        overflow |= jnp.any(counts > spec.s)
        qg = spec.s & -spec.s
        chunks = spec.s // qg
        c = jnp.minimum(counts, spec.s).reshape(
            spec.n_seg, spec.t_seg, spec.r
        ).transpose(0, 2, 1)
        c = jnp.clip(
            c[..., None] - jnp.arange(chunks, dtype=jnp.int32) * qg, 0, qg
        )
        ctable = c.reshape(-1)
        prev_s = spec.s
        ops = data

    # raw-key leaf, identical to the radix engine's: segments are value
    # ranges in ascending order; adjacent segments may share only equal
    # (heavy/boundary) values, so packed-tile sorts stay globally ordered
    from tpusort.kernels.bitonic import sort_tiles_counts
    from tpusort.kernels.collapse import collapse_segments

    pack = 1
    while (
        pack * 2 * plan.seg <= (1 << 15)
        and plan.n_segments % (pack * 2) == 0
    ):
        pack *= 2
    nt = plan.n_segments // pack
    tile = pack * plan.seg
    ct = ctable.reshape(nt, tile // qg)
    sorted_ops = sort_tiles_counts(
        [o.reshape(nt, tile) for o in ops], ct, qg,
        sorted_run=(prev_s & -prev_s), interpret=interpret,
    )
    tile_counts = ct.sum(axis=1, dtype=jnp.int32)
    out = collapse_segments(sorted_ops, tile_counts, n, interpret=interpret)

    def _fallback(_):
        sp, _ = sort_twiddled_reference(
            planes, values, begin_bit=begin_bit, end_bit=end_bit,
            total_bits=total_bits,
        )
        return list(sp)

    res = jax.lax.cond(overflow, _fallback, lambda _: out, None)
    return (res[0],), ()
