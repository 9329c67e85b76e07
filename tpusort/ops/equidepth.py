"""Equi-depth (sampled-splitter) MSD engine — the adaptive skew tier.

The radix engine's static per-digit capacities cannot absorb consistently
biased digit distributions (entropy-reduced keys, Zipfian duplication,
presorted blocks): the reference handles those with dynamic bucket→block
work queues and hot-bucket splitting
(``msb/src/sort/cuda_radix_sort.h:437-447,992-1271``), which do not map to
XLA's static shapes.  The TPU-native equivalent makes the BUCKETS adaptive:

* sample the (twiddled) input with a static stride, sort the sample once
  (~n/8 elements, via the radix engine itself), and read an equi-depth
  quantile table Q of R^p - 1 splitters plus each splitter value's run
  endpoints in SAMPLE ranks (tie spans);
* feed pass 0 through a strided, index-bit-mixed tile assignment (a free
  XLA transpose) so every tile mirrors the global distribution — locally
  concentrated inputs (presorted runs) would overflow per-tile capacities
  otherwise, and a pure stride aliases rank-structured input at deeper
  passes;
* pass j in segment g partitions against the R-1 splitters
  Q[((g*R + i) * R^(p-1-j)) - 1] — balanced buckets for ANY distribution;
* the kernel needs no digits at all: tiles are raw-key sorted (the same
  1-operand network + merge entries as the radix fast path), and range
  buckets of a sorted tile are CONTIGUOUS — the cut for bucket d lands at
  the PROPORTIONAL position inside its tie range [#keys < s_d,
  #keys <= s_d] (fraction = the boundary's share of the tied value per
  the sample, dither-rounded so per-tile floor bias cancels in
  aggregate), clipped by the static capacity with a backward relief
  sweep; boundary-valued keys are equal across tiles, so any split
  preserves global order;
* the deepest splitter level carries the sample's quantile noise, so the
  final pass's capacity is widened by the expected worst-bucket excess
  (``_widen_last``);
* a cut forced outside its legal range means the sample misjudged a
  bucket — the kernel poisons that tile's counts and the engine falls back
  to the exact reference sort via ``lax.cond``.

Keys-only, single-plane, full bit range (delegates otherwise).  Measured
(v5e, 2^26): ~300-400 M keys/s on uniform, entropy-reduced, Zipfian 1.1,
and presorted inputs — 1.7-2.3x the radix engine's exact fallback on the
skewed ones.  See DESIGN.md "Equi-depth engine findings" for the five
failure modes these mechanisms were built against.
"""

from __future__ import annotations

import math
from dataclasses import replace
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tpusort.ops import msd as _msd
from tpusort.ops.reference import sort_twiddled_reference

__all__ = ["sort_twiddled_equidepth", "supports"]

# Sample-size cap.  The in-graph sample sort is the tier's dominant fixed
# cost (a 2^25 sample via the msd engine costs ~45 ms at 2^28 input); at
# 2^22 the deepest-level quantile noise still clears the big-tile plan's
# capacity after _widen_last (nq=1024: mean*(1+3.72*sqrt(nq/m)) + 6.5
# sigma = 2004 <= s=2048 at 2^28), so a bigger sample buys nothing THERE.
# Past 2^28 the deepest splitter count nq ~ n/seg keeps growing while a
# fixed cap would shrink the margin (the noise term sqrt(nq/m) scales with
# n/m), so the cap scales as n/64 — identical to the fixed 2^22 for all
# n <= 2^28, constant relative noise above.


def _sample_cap(n: int) -> int:
    return max(1 << 22, n >> 6)


def _widen_last(plan: "_msd.MsdPlan", n: int, m_sample: int,
                leaf_max: int) -> "_msd.MsdPlan":
    """Widen the final pass's run capacity for quantile noise.

    The radix planner's capacity guard covers binomial tile noise only; the
    deepest splitter level adds a *common-across-tiles* bucket-share error
    with relative sigma ~ sqrt(nq/m) (spacing of m/nq samples per bucket).
    The worst of nq buckets runs ~sqrt(2 ln nq) sigma over mean, ON TOP of
    which the binomial tile tail applies — without widening, a 2^26 uniform
    sort overflows its 512 cap with near-certainty (measured: max leaf
    bucket ~28% over mean at m=2^23) and silently runs pipeline+fallback.
    Earlier passes use exponentially coarser splitter levels (sigma down by
    r^(p-1-j)/2 in log), so only the last pass needs slack.
    """
    last = plan.passes[-1]
    p = len(plan.passes)
    nq = last.r ** p
    sq = math.sqrt(nq / max(m_sample, 1))
    zq = math.sqrt(2 * math.log(max(nq, 2)))
    t_last = last.n_seg * last.t_seg
    mean = n / (t_last * last.r)     # per-(tile, bucket) valid occupancy
    mean_q = mean * (1 + zq * sq)
    required = mean_q + 6.5 * math.sqrt(max(mean_q, 1.0))
    s_new = -(-int(required) // 128) * 128
    if s_new <= last.s:
        return plan
    seg = last.t_seg * s_new
    if s_new > last.k or seg > leaf_max or seg % 128:
        return plan        # geometry can't absorb it; runtime fallback
    passes = plan.passes[:-1] + (replace(last, s=s_new),)
    return _msd.MsdPlan(
        m1=plan.m1, passes=passes, seg=seg, n_segments=plan.n_segments,
        m_final=plan.n_segments * seg, rem_lo=plan.rem_lo,
        rem_width=plan.rem_width,
    )


def supports(nplanes: int, n_values: int, begin_bit: int, end_bit: int,
             total_bits: int, stable: bool = False) -> bool:
    """Whether the splitter pipeline itself can run this shape.

    Multi-plane (u64) keys compare lexicographically against per-plane
    splitter words; payloads ride the raw-key network (unstable pair
    semantics — stable pairs go through the composite (key, position)
    plane trick, which needs a free plane slot, hence nplanes == 1).
    """
    if begin_bit != 0 or end_bit != total_bits or total_bits != 32 * nplanes:
        return False
    if stable and n_values:
        return nplanes == 1      # composite (key, gidx) trick
    return nplanes in (1, 2)


class _EqTable:
    """Equi-depth splitter table with sample-resolution tie spans.

    q[p][z] is plane p's word of the key value at boundary slot z; lo/hi
    are the value's run endpoints IN SAMPLE RANKS (searchsorted
    left/right), which give tie fractions at 1/sample-copies resolution —
    table-slot resolution (m/nq ranks per slot) quantizes a mid-mass
    value's split by 20%+ of its mass and overflows the uncapped top
    bucket (measured on zipf)."""

    __slots__ = ("q", "lo", "hi", "ranks", "m")

    def __init__(self, q, lo, hi, ranks, m):
        self.q, self.lo, self.hi, self.ranks, self.m = q, lo, hi, ranks, m


def _quantile_table(planes: Sequence[jax.Array], n: int, nq: int,
                    sample_log2: Optional[int] = None) -> _EqTable:
    """Equi-depth splitters + tie spans from a strided sample of planes[:n].

    The deepest splitter level needs low relative noise: with sample size
    m, a leaf bucket's size estimate has sigma ~ sqrt(nq/m); the static
    capacity margin is ~50%, so we take m ~ n/8 (>= 256 samples per leaf
    bucket at production geometry), sorted by the radix engine itself
    (one level of reuse, ~10-20 ms at 2^25).  Multi-plane keys sort
    lexicographically and tie spans compare all planes.
    """
    import numpy as _np

    if sample_log2 is None:
        target = max(1 << 16, min(_sample_cap(n), n // 8))
    else:
        target = 1 << sample_log2
    stride = max(1, n // target)
    samples = [jax.lax.slice(p, (0,), (n,), (stride,)) for p in planes]
    m = samples[0].shape[0]
    bits = 32 * len(planes)
    if m >= (1 << 18):
        # skew_tier=False: the sample sort must not nest another equidepth
        # branch (recursive cond workspace); a skewed sample just takes
        # this inner sort's reference fallback
        sp, _ = _msd.sort_twiddled_msd(
            tuple(samples), (), begin_bit=0, end_bit=bits, total_bits=bits,
            skew_tier=False,
        )
        samples = list(sp)
    else:
        samples = list(
            jax.lax.sort(samples, num_keys=len(samples), is_stable=False)
        )
    # ranks are static: compute with Python ints (i * m overflows int32 for
    # deep tables — nq 32767 x m 2^23 — and this backend has no 64-bit)
    ranks = _np.fromiter(
        (min(i * m // (nq + 1), m - 1) for i in range(1, nq + 1)),
        dtype=_np.int32, count=nq,
    )
    rk = jnp.asarray(ranks)
    q = [s[rk] for s in samples]
    # run endpoints of every slot's value, via O(m) run-start scans (a
    # searchsorted over the 8M sample is a gather-based binary search —
    # measured ~40 ms; two cummax scans are ~1 ms)
    idx = jnp.arange(m, dtype=jnp.int32)
    neq = samples[0][1:] != samples[0][:-1]
    for s in samples[1:]:
        neq = neq | (s[1:] != s[:-1])
    neq_prev = jnp.concatenate([jnp.ones((1,), bool), neq])
    first = jax.lax.cummax(jnp.where(neq_prev, idx, 0))
    neq_next = jnp.concatenate([neq, jnp.ones((1,), bool)])
    first_rev = jax.lax.cummax(jnp.where(neq_next[::-1], idx, 0))
    last1 = m - first_rev[::-1]        # last occurrence + 1
    return _EqTable(q, first[rk], last1[rk], ranks, m)


def _pass_splitters(table: _EqTable, p: int, j: int, r: int,
                    t_seg: int) -> Tuple[jax.Array, jax.Array]:
    """Per-tile splitters AND tie-split fractions for pass j.

    Returns ((T_j, r-1) uint32 splitters, (T_j, r-1) uint32 16-bit
    fixed-point fractions).  Segment g uses Q[((g*r + i) * r^(p-1-j)) - 1].

    The fraction says where inside a tied (boundary-valued) span the cut
    belongs: of the splitter value v's SAMPLE copies, the share that lies
    below this boundary rank, renormalized to the enclosing segment's
    slice of v.  Cutting ties PROPORTIONALLY (not greedily to capacity)
    keeps every pass's allocation consistent with the deeper splitters: a
    greedy fill hands a boundary-straddling heavy value more copies than
    the segment's quantile share, and the next pass — whose splitters
    grant v only its quantile-true sub-buckets — has nowhere to put the
    excess (measured on zipf 1.1: 6177 copies/tile vs 2 sub-buckets +
    uncapped top -> guaranteed overflow)."""
    import numpy as _np

    nq = table.ranks.shape[0]
    i = _np.arange(1, r, dtype=_np.int64)[None, :]
    g = _np.arange(r ** j, dtype=_np.int64)[:, None]
    stride = r ** (p - 1 - j)
    z = ((g * r + i) * stride - 1).astype(_np.int32)   # (r^j, r-1)
    spl_seg = [qp[jnp.asarray(z)] for qp in table.q]
    lo = table.lo[jnp.asarray(z)]                      # v's sample-rank span
    span = jnp.maximum(table.hi[jnp.asarray(z)] - lo, 1)
    # boundary ranks (static): slot z cuts at sample rank ranks[z]; the
    # parent segment's bounds sit at slots g*r*stride-1 / (g+1)*r*stride-1
    # (rank 0 below slot 0, rank m above slot nq-1)
    rk = table.ranks

    def rank_at(slots):
        s_ = _np.clip(slots, 0, nq - 1)
        rr = rk[s_].astype(_np.int64)
        rr = _np.where(slots < 0, 0, rr)
        rr = _np.where(slots >= nq, table.m, rr)
        return rr

    r_z = rank_at(z)
    r_l = rank_at((g * r * stride - 1).astype(_np.int64)
                  * _np.ones_like(z, dtype=_np.int64))
    r_r = rank_at(((g + 1) * r * stride - 1).astype(_np.int64)
                  * _np.ones_like(z, dtype=_np.int64))

    def below(ranks_np):
        return jnp.clip(jnp.asarray(ranks_np.astype(_np.int32)) - lo, 0,
                        span)

    num = below(r_z) - below(r_l)
    den = jnp.maximum(below(r_r) - below(r_l), 1)
    frac = jnp.clip(
        (num.astype(jnp.float32) / den.astype(jnp.float32) * 65536.0)
        .astype(jnp.int32),
        0, 65536,
    )
    return (
        [jnp.repeat(sp_, t_seg, axis=0) for sp_ in spl_seg],
        jnp.repeat(frac.astype(jnp.uint32), t_seg, axis=0),
    )


def _run_pipeline(
    planes: Sequence[jax.Array],
    values: Sequence[jax.Array],
    n: int,
    plan: "_msd.MsdPlan",
    q: _EqTable,
    interpret: Optional[bool],
    batch: Optional[int] = None,
) -> Tuple[list, jax.Array]:
    """Splitter passes + raw-key leaf + collapse over twiddled plane(s)
    plus payload operands (which ride the raw network — unstable pair
    semantics, like the msd raw path).

    Returns (sorted (n,) ops [planes..., values...], overflow flag).  The
    caller owns the quantile table and the fallback decision.
    """
    from tpusort.kernels.partition import partition_pass_fused

    nplanes = len(planes)
    p = len(plan.passes)
    r = plan.passes[0].r
    k0 = plan.passes[0].k
    t1 = plan.m1 // k0

    # Strided tile assignment (the sample-sort input shuffle, as a free XLA
    # transpose): tile t takes elements {j*T + mix(t)}, so every tile
    # mirrors the GLOBAL distribution.  Without it, locally concentrated
    # inputs — presorted runs, clustered duplicates — overflow per-tile
    # capacities even though the splitters balance the global histogram (a
    # tile whose 16K keys all fall in one bucket needs 16K capacity;
    # strided tiles need mean + binomial sigma only).  mix() swaps the two
    # halves of the tile index (t = a*B+b -> b*A+a): a pure stride aliases
    # rank-structured input — for PRESORTED keys, pass-2 tiles regroup
    # runs of ~contiguous pass-0 tiles, whose position-residues then
    # occupy one contiguous band of [0, T) and hit alternate leaf-bucket
    # windows (measured: alternating full/empty buckets, every tile
    # poisoned).  The swap spreads any contiguous tile band across [0, T)
    # at granularity <= A, so bucket windows (>> A wide) stay balanced.
    # The reorder applies to every operand (payloads ride along).
    all_in = [jnp.asarray(o).view(jnp.uint32) for o in
              list(planes) + list(values)]
    padded_ops = [jnp.pad(o, (0, plan.m1 - n)) for o in all_in]
    a_mix = 1 << ((t1.bit_length() - 1) // 2)
    b_mix = t1 // a_mix
    t_idx = jnp.arange(t1, dtype=jnp.int32)
    if a_mix * b_mix == t1:
        strided_ops = [
            o.reshape(k0, b_mix, a_mix).transpose(2, 1, 0).reshape(-1)
            for o in padded_ops
        ]
        mixvec = (t_idx % b_mix) * a_mix + t_idx // b_mix
    else:
        strided_ops = [o.reshape(k0, t1).T.reshape(-1) for o in padded_ops]
        mixvec = t_idx
    # validity: tile t's slot j holds element j*T + mix(t), valid iff < n;
    # per-tile valid-prefix length ceil((n - mix(t)) / T), as a counts chain
    qg = 128
    thr = (n - mixvec + t1 - 1) // t1
    c0 = jnp.clip(
        thr[:, None]
        - jnp.arange(k0 // qg, dtype=jnp.int32)[None, :] * qg,
        0, qg,
    )
    ops = strided_ops
    ctable = c0.reshape(-1)
    prev_s = None
    overflow = jnp.asarray(False)
    for j, spec in enumerate(plan.passes):
        t = spec.n_seg * spec.t_seg
        tiled = [o.reshape(t, spec.k) for o in ops]
        spl, frac = _pass_splitters(q, p, j, r, spec.t_seg)
        cin = ctable.reshape(t, spec.k // qg)
        sorted_run = None if prev_s is None else (prev_s & -prev_s)
        data, counts = partition_pass_fused(
            tiled[:nplanes], tiled[nplanes:], cin, q_in=qg,
            r=spec.r, s=spec.s, lo_bit=spec.lo_bit, width=spec.width,
            sorted_run=sorted_run, t_seg=spec.t_seg, splitters=spl,
            splitter_fracs=frac, unstable=True, interpret=interpret,
            batch=batch,
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
    from tpusort.kernels.bitonic import sort_tiles_counts_collapsed

    pack = 1
    while (
        pack * 2 * plan.seg <= (1 << 15)
        and plan.n_segments % (pack * 2) == 0
    ):
        pack *= 2
    nt = plan.n_segments // pack
    tile = pack * plan.seg
    ct = ctable.reshape(nt, tile // qg)
    # fused leaf + collapse (see kernels/bitonic.py): dense output written
    # directly at the counts-chain cumsum offsets
    out = sort_tiles_counts_collapsed(
        [o.reshape(nt, tile) for o in ops], ct, qg, n,
        sorted_run=(prev_s & -prev_s), num_keys=nplanes,
        interpret=interpret,
    )
    return out, overflow


def _prepare(n: int, plan_kwargs: Optional[dict]):
    """Resolve plan-kwargs into (msd-kwargs, min_n, sample target, leaf_max)."""
    kwargs = dict(plan_kwargs or {})
    min_n = kwargs.pop("min_n", 1 << 16)
    sample_log2 = kwargs.pop("sample_log2", None)
    if sample_log2 is not None:
        m_sample = 1 << sample_log2
    else:
        m_sample = max(1 << 16, min(_sample_cap(n), n // 8))
    leaf_max = kwargs.get("leaf_max") or max(
        2 * kwargs.get("k", 1 << 14), 1 << 15
    )
    return kwargs, min_n, sample_log2, m_sample, leaf_max


def sort_twiddled_equidepth(
    planes: Tuple[jax.Array, ...],
    values: Sequence[jax.Array],
    *,
    begin_bit: int,
    end_bit: int,
    total_bits: int,
    use_pallas: Optional[bool] = None,
    plan_kwargs: Optional[dict] = None,
    stable: bool = False,
    on_overflow: str = "cond",
    config=None,
):
    """Engine-registry entry.

    Universal skew tier (VERDICT r1 #2): supports keys-only and unstable
    pairs for u32 and u64 (2-plane lexicographic) keys, plus STABLE u32
    pairs via the composite (key, position) plane trick — the same shapes
    the reference's dynamic hot-bucket machinery covers
    (``cuda_radix_sort.h:437-447,992-1271``).  Delegates to the exact
    reference sort otherwise.

    ``on_overflow="flag"`` returns ``(planes, values, overflow)`` and
    leaves the fallback decision to the caller (host-owned tiering, no
    in-graph workspace reservation — this is what lifts the old n < 2^28
    skew-tier gate).
    """
    flag_mode = on_overflow == "flag"
    n = planes[0].shape[0]
    if plan_kwargs is None and config is not None:
        plan_kwargs = config.plan_kwargs()
        if config.skew_sample_log2 is not None:
            plan_kwargs["sample_log2"] = config.skew_sample_log2
    kwargs, min_n, sample_log2, m_sample, leaf_max = _prepare(n, plan_kwargs)

    def _delegate():
        sp, sv = sort_twiddled_reference(
            planes, values, begin_bit=begin_bit, end_bit=end_bit,
            total_bits=total_bits,
        )
        return (sp, sv, jnp.asarray(False)) if flag_mode else (sp, sv)

    if (
        not supports(len(planes), len(values), begin_bit, end_bit,
                     total_bits, stable=stable)
        or n < min_n
        or any(jnp.dtype(v.dtype).itemsize != 4 for v in values)
    ):
        return _delegate()

    if stable and values:
        # composite (key, position) plane: position is unique, so the
        # unstable 2-plane pipeline is stable-by-key (and the all-ones
        # garbage sentinel can never match a real (key, gidx))
        gidx = jnp.arange(n, dtype=jnp.uint32)
        res = sort_twiddled_equidepth(
            (planes[0], gidx), values, begin_bit=0, end_bit=64,
            total_bits=64, use_pallas=use_pallas, plan_kwargs=plan_kwargs,
            stable=False, on_overflow=on_overflow,
        )
        if flag_mode:
            return (res[0][:1], res[1], res[2])
        return res[0][:1], res[1]

    plan = _msd.plan_msd(n, begin_bit, end_bit, **kwargs)
    if plan is None:
        return _delegate()
    plan = _widen_last(plan, n, m_sample, leaf_max)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    interpret = (not use_pallas) or None

    q = _quantile_table(planes, n,
                        plan.passes[0].r ** len(plan.passes) - 1,
                        sample_log2=sample_log2)
    out, overflow = _run_pipeline(
        planes, values, n, plan, q, interpret,
        batch=(config.pass_batch if config is not None else None),
    )
    if values:
        # pairs ride the raw network: a valid key equal to the all-ones
        # garbage sentinel could swap payloads with a dropped pad slot
        is_max = planes[0] == jnp.uint32(0xFFFFFFFF)
        for p_ in planes[1:]:
            is_max = is_max & (p_ == jnp.uint32(0xFFFFFFFF))
        overflow |= jnp.any(is_max)

    nplanes = len(planes)
    out_planes = tuple(out[:nplanes])
    out_values = tuple(
        o.view(jnp.asarray(v).dtype) for o, v in zip(out[nplanes:], values)
    )
    if flag_mode:
        return out_planes, out_values, overflow

    def _fallback(_):
        sp, sv = sort_twiddled_reference(
            planes, values, begin_bit=begin_bit, end_bit=end_bit,
            total_bits=total_bits,
        )
        return list(sp) + [jnp.asarray(v).view(jnp.uint32) for v in sv]

    res = jax.lax.cond(
        overflow, _fallback, lambda _: [o.view(jnp.uint32) for o in out],
        None,
    )
    rp = tuple(res[:nplanes])
    rv = tuple(
        o.view(jnp.asarray(v).dtype) for o, v in zip(res[nplanes:], values)
    )
    return rp, rv
