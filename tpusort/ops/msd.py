"""MSD hybrid radix sort engine ("msd").

TPU-native re-architecture of the reference's MSB hierarchical radix sort
(``msb/src/sort/gpu_radix_sort.h:197-507`` orchestrator;
``cuda_radix_sort.h:374-641`` partition kernels; ``:1342-1620`` local/leaf
sorts).  The GPU design — atomics to reserve bucket ranges, a CPU planner in
the pass loop, dynamic bucket->block work queues — does not map to TPU/XLA
(static shapes, no atomics, sequential grids).  The equivalent structure here
is fully static:

* **partition pass**: tiles are sorted by (digit, idx) [a stable local
  digit-binning], each tile's R digit runs are emitted PADDED to a static
  capacity S, laid out (T, R, S); the global exchange is then a free XLA
  transpose to digit-major (R, T, S).  Padding replaces the reference's
  atomic offset reservations AND its CPU block planner: bucket-size variance
  is absorbed by slack instead of dynamic work assignment.
* **validity is positional, never stored**: a pad slot (d, s) of a tile is
  garbage iff s >= c(t, d); each pass derives a validity mask from the
  previous pass's (tiny) counts table.  No payload bits are spent.
* **leaf pass**: after p passes the (d1..dp) buckets are contiguous padded
  segments small enough to sort entirely in VMEM over the remaining key
  bits (packed with a stability index into a single uint32 sortkey when
  they fit) — the analog of ``do_locrec_radix_sort_keys`` finishing small
  buckets in one thread block.
* **skew**: a run overflowing its capacity (c > S) is detected from the
  counts (the analog of the reference's hot-bucket look-ahead trigger,
  ``cuda_radix_sort.h:437-447``); the engine then falls back to the stable
  XLA sort via lax.cond, so correctness never depends on the distribution.
* one final order-preserving compaction drops the pad slots.

Unlike the reference's MSB sort this engine is STABLE (tile sorts tiebreak
on position, runs concatenate in tile order), so it can serve as the LSB
engine's semantics too.

This module is the XLA-level implementation; the Pallas kernels in
``tpusort.kernels`` slot into ``_sort_tiles``/``_expand`` (selected by
config) to replace lax.sort and the monotonic gather on TPU.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tpusort.ops.reference import sort_twiddled_reference

# ---------------------------------------------------------------------------
# Geometry planning
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PassSpec:
    n_seg: int       # independent segments this pass operates within
    t_seg: int       # tiles per segment
    k: int           # tile size (elements)
    r: int           # radix (runs per tile)
    s: int           # padded run capacity (elements, multiple of 128)
    lo_bit: int      # LSB position of this pass's digit
    width: int       # digit width in bits (<= log2(r))


@dataclass(frozen=True)
class MsdPlan:
    m1: int                      # padded element count entering pass 1
    passes: Tuple[PassSpec, ...]
    seg: int                     # final segment size (elements)
    n_segments: int
    m_final: int
    rem_lo: int                  # leaf sorts bits [rem_lo, rem_lo + rem_width)
    rem_width: int


def plan_msd(
    n: int,
    begin_bit: int,
    end_bit: int,
    *,
    k: int = 1 << 14,
    r: int = 32,
    s1: Optional[int] = None,
    s: Optional[int] = None,
    leaf_max: Optional[int] = None,
    leaf_profile: str = "raw",
    t1_force: Optional[int] = None,
) -> Optional[MsdPlan]:
    """Compute a static pass plan, or None if no feasible plan exists.

    Geometry invariants (all checked):
      * every pass's tiles hold exactly K elements and emit R runs of S;
      * pass outputs regroup into next-pass tiles without straddling digit
        segments (T_seg multiple of K/S_prev runs-per-tile, segments multiples
        of K);
      * the final segments are <= leaf_max and multiples of 128.

    ``leaf_profile`` keys the cost model on the leaf kernel VARIANT the
    remaining bit width will select (the ``GetSortKernel`` analog,
    ``msb/src/sort/gpu_sort_config.h:250-264``): ``"raw"`` paths sort the
    raw key planes (width-independent); ``"packed"`` paths pack
    (rem, idx) into one sortkey word and fall to the ~5x multikey XLA
    leaf when ``rem_width + idx_bits + 1 > 32`` — so near that boundary
    the search trades an extra partition pass against the slow leaf.
    """
    import math

    log_r = r.bit_length() - 1
    if s1 is None:
        s1 = ((3 * k // (2 * r)) // 128) * 128      # alpha ~ 1.5 on pass 1
    if s is None:
        s = k // r                                  # alpha-preserving after
    if leaf_max is None:
        # leaf tiles up to 2*K fit VMEM comfortably for 1-2 operand merges;
        # a bigger leaf saves a whole partition pass at awkward sizes
        leaf_max = max(2 * k, 1 << 15)
    if k % (r * 128) or s % 128 or s1 % 128:
        return None

    bits = end_bit - begin_bit

    import math as _math

    def _cap_ok(kp: int, cap: int, density: float) -> bool:
        """Run capacity must clear the binomial mean by ~6.5 sigma, or
        uniform inputs would routinely trip the overflow fallback."""
        mean = kp * density / r
        sigma = _math.sqrt(max(mean * (1 - 1 / r), 1.0))
        return cap >= mean + 6.5 * sigma

    def _try(p: int, t1: int) -> Optional[MsdPlan]:
        """Build a p-pass plan with T1 tiles, or None if infeasible."""
        density = (k / r) / s1          # valid fraction after pass 0
        if not _cap_ok(k, s1, 1.0):
            return None
        seg = t1 * s1
        specs = [PassSpec(1, t1, k, r, s1, end_bit - min(log_r, bits),
                          min(log_r, bits))]
        n_seg = r
        for _ in range(1, p):
            # segments must be whole numbers of tiles (tiles may not span
            # two digit segments — that would interleave order boundaries).
            # When the default tile size doesn't divide the segment, shrink
            # this pass's tile (e.g. 2^29: seg3 = 24576 = 3 * 8192).
            kp = k
            while kp >= r * 128 and seg % kp:
                kp //= 2
            if kp < r * 128 or seg % kp:
                return None
            sp_ = kp // r if s == k // r else s
            if sp_ % 128 or sp_ > kp:
                return None
            if not _cap_ok(kp, sp_, density):
                return None
            t_seg = seg // kp
            consumed = sum(q.width for q in specs)
            width = min(log_r, bits - consumed)
            if width <= 0:
                return None
            lo = end_bit - consumed - width
            specs.append(PassSpec(n_seg, t_seg, kp, r, sp_, lo, width))
            seg = t_seg * sp_
            n_seg *= r
        if seg > leaf_max or seg % 128:
            return None
        consumed = sum(sp.width for sp in specs)
        return MsdPlan(
            m1=t1 * k,
            passes=tuple(specs),
            seg=seg,
            n_segments=n_seg,
            m_final=n_seg * seg,
            rem_lo=begin_bit,
            rem_width=bits - consumed,
        )

    # Non-network per-pass cost (emit window slices + starts compare-reduces
    # + exchanged-out write), in compare-exchange stage-equivalents per
    # element.  Re-calibrated r4 (benchmarks/pass_decomp.py at the adopted
    # k=65536 geometry, 2^28): stage price 2.39 ps/elem; starts +6.4 ms,
    # exchanged write +5 ms per pass = ~43 ps = ~18 slots; the fused
    # leaf+collapse runs ~17-22 ms over its slot model = ~20 slots.
    _OH_PASS = 18.0
    _OH_LEAF = 20.0      # fused leaf+collapse write discipline

    def _leaf_slots(seg: int, run: int) -> float:
        """Exact compare-exchange stage-slots (stages x elements) of the
        raw-key leaf network over one ``seg``-element tile with sorted
        ``run``-subruns: the staged f*2^a merge when it applies (its final
        phases run on partial/padded extents — counted exactly, matching
        kernels.bitonic._merge_sorted_runs_fpow2), else the pow2-padded
        bitonic merge."""
        from tpusort.kernels.bitonic import merge_staged_factor

        c = run.bit_length() - 1
        f = merge_staged_factor(seg)
        if f and (seg // f) % run == 0:
            blk = seg // f
            a = blk.bit_length() - 1
            slots = sum(range(c + 1, a + 1)) * seg        # phases c..a-1
            slots += (a + 1) * (f - 1) * blk              # phase a, front
            if f == 5:
                slots += (a + 2) * 4 * blk                # phase a+1, front
            # cascade back-insertion: (f-1) directed 2-block merges of
            # (a+1) stages each, plus ~2 block reversals
            slots += (a + 1) * 2 * (f - 1) * blk + 2 * a * blk
            return float(slots)
        pow2 = 1 << (seg - 1).bit_length()
        return float(sum(range(c + 1, pow2.bit_length())) * pow2)

    def _cost(plan: MsdPlan) -> float:
        """Stage-slot cost model (CE stages x elements + per-pass emit/HBM
        overheads, with penalties for batching-hostile tiny t_seg)."""
        total = 0.0
        prev_s = None
        for sp in plan.passes:
            nb_pen = 1.0 if sp.t_seg % 4 == 0 else 1.35
            lgk = sp.k.bit_length() - 1
            if prev_s is None:
                stages = lgk * (lgk + 1) / 2          # full sort
            else:
                k0 = (prev_s & -prev_s).bit_length() - 1
                stages = sum(range(k0 + 1, lgk + 1))  # merge tail
            total += (stages * nb_pen + _OH_PASS) * sp.n_seg * sp.t_seg * sp.k
            prev_s = sp.s
        # leaf: merge from the last pass's pow2 run size
        run = prev_s & -prev_s
        # leaf variant keyed on the remaining bit width (GetSortKernel
        # analog): the packed-sortkey network needs rem + idx (+ tie
        # headroom) to fit one u32 word; past that the leaf drops to the
        # multikey XLA sort (~5x slower per element).  Raw-key leaves
        # (keys-only / unstable pairs / composite stable) sort the key
        # planes themselves — width-independent.
        leaf_mult = 1.0
        if leaf_profile == "packed":
            idx_bits = (plan.seg - 1).bit_length()
            if plan.seg >= (1 << idx_bits):
                idx_bits += 1
            leaf_mult = (
                5.0 if plan.rem_width + idx_bits + 1 > 32 else 1.15
            )
        total += plan.n_segments * (
            _leaf_slots(plan.seg, run) * leaf_mult + _OH_LEAF * plan.seg
        )
        return total

    best = None
    for p in range(1, 5):
        if bits < log_r * p:
            break
        if t1_force is not None:
            # fixed pass-0 tile count (the sorted-window finish: the input
            # IS the padded physical layout, m1 = t1*k exactly)
            plan = _try(p, t1_force)
            if plan is not None:
                c = _cost(plan)
                if best is None or c < best[0]:
                    best = (c, plan)
            continue
        quantum = k // math.gcd(s1, k)
        tiles_needed = -(-n // k)
        t1_base = -(-tiles_needed // quantum) * quantum
        for step in range(512):
            t1 = t1_base + step * quantum
            if t1 * k > max(8 * n, 1 << 23):
                break
            plan = _try(p, t1)
            if plan is not None:
                c = _cost(plan)
                if best is None or c < best[0]:
                    best = (c, plan)
        # keep searching other pass counts and t1 values: more passes or
        # more padding can beat a batching-hostile shallower plan
    return None if best is None else best[1]


# ---------------------------------------------------------------------------
# Bit-plane helpers
# ---------------------------------------------------------------------------


def _extract_bits(planes: Sequence[jax.Array], lo: int, width: int) -> jax.Array:
    """Bits [lo, lo+width) of the multi-plane key, as uint32 (width <= 32).

    Plane 0 is the most-significant 32 bits.
    """
    nplanes = len(planes)
    out = None
    for i, pl_ in enumerate(planes):
        base = 32 * (nplanes - 1 - i)
        ov_lo = max(lo, base)
        ov_hi = min(lo + width, base + 32)
        if ov_hi <= ov_lo:
            continue
        mask = jnp.uint32((1 << (ov_hi - ov_lo)) - 1)
        chunk = (pl_ >> jnp.uint32(ov_lo - base)) & mask
        chunk = chunk << jnp.uint32(ov_lo - lo)
        out = chunk if out is None else out | chunk
    if out is None:
        return jnp.zeros_like(planes[0])
    return out


# ---------------------------------------------------------------------------
# Pass building blocks (XLA versions; Pallas kernels replace on TPU)
# ---------------------------------------------------------------------------


def _sort_tiles_xla(ops: List[jax.Array]) -> List[jax.Array]:
    """Sort rows of each (T, K) operand ascending by ops[0] (all uint32)."""
    return list(jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=False))


def _expand_xla(
    sorted_ops: List[jax.Array], starts: jax.Array, r: int, s: int
) -> List[jax.Array]:
    """Monotonic padded expand: (T, K) sorted tiles -> (T, R*S) padded runs.

    out[t, d*S + j] = sorted[t, starts[t, d] + j]   (clamped; slots beyond a
    run's count are positionally-invalid garbage and never consulted).
    """
    T, K = sorted_ops[0].shape
    offs = jnp.arange(s, dtype=jnp.int32)
    idx = starts[:, :, None].astype(jnp.int32) + offs[None, None, :]  # (T,R,S)
    idx = jnp.minimum(idx.reshape(T, r * s), K - 1)
    return [jnp.take_along_axis(o, idx, axis=1) for o in sorted_ops]


def _valid_mask(run_counts: jax.Array, s_prev: int, t: int, k: int) -> jax.Array:
    """(T, K) bool validity from the previous pass's run counts.

    Element at GLOBAL flat position p is valid iff (p mod S_prev) <
    counts[p div S_prev].  Runs may straddle tile boundaries (stability is
    unaffected: a straddled run's head and tail tiles emit in tile order);
    only segment boundaries must align with tiles, which the plan checks.
    """
    num_runs = (t * k) // s_prev
    c = run_counts.reshape(num_runs, 1)
    pos = jnp.arange(s_prev, dtype=jnp.int32)
    return (pos[None, :] < c).reshape(t, k)


def _histogram(digit: jax.Array, valid: jax.Array, r: int) -> jax.Array:
    """(T, R) counts of valid digits (one-hot sum; Pallas later)."""
    oh = (digit[:, :, None] == jnp.arange(r, dtype=jnp.uint32)) & valid[:, :, None]
    return oh.sum(axis=1, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# The engine
# ---------------------------------------------------------------------------


def _partition_pass(
    ops: List[jax.Array],
    planes_slice: slice,
    run_counts: jax.Array,
    s_prev: int,
    spec: PassSpec,
    use_pallas: bool,
) -> Tuple[List[jax.Array], jax.Array, jax.Array]:
    """One MSD partition pass over flat operands.

    ops: flat (M,) uint32 arrays: [plane0, plane1?, values...].
    Returns (new_ops, new_run_counts, overflow_flag).
    """
    m = ops[0].shape[0]
    t = spec.n_seg * spec.t_seg
    k, r, s = spec.k, spec.r, spec.s
    tiled = [o.reshape(t, k) for o in ops]
    planes = tiled[planes_slice]

    digit = _extract_bits(planes, spec.lo_bit, spec.width).reshape(t, k)
    valid = _valid_mask(run_counts, s_prev, t, k)

    counts = _histogram(digit, valid, r)                       # (T, R)
    overflow = jnp.any(counts > s)
    starts = jnp.cumsum(counts, axis=1) - counts               # exclusive

    idx_bits = k.bit_length() - 1
    idx = jnp.arange(k, dtype=jnp.uint32)[None, :]
    sentinel = jnp.uint32(r)
    d_or_s = jnp.where(valid, digit, sentinel)
    sortkey = (d_or_s << jnp.uint32(idx_bits)) | idx

    if use_pallas:
        from tpusort.kernels.partition import partition_tiles

        out_tiles = partition_tiles([sortkey] + tiled, starts, r=r, s=s)
    else:
        sorted_ops = _sort_tiles_xla([sortkey] + tiled)[1:]
        out_tiles = _expand_xla(sorted_ops, starts, r, s)      # (T, R*S)

    # global exchange: digit-major within each segment (free XLA transpose)
    out = []
    for o in out_tiles:
        o4 = o.reshape(spec.n_seg, spec.t_seg, r, s)
        out.append(o4.transpose(0, 2, 1, 3).reshape(-1))
    cT = counts.reshape(spec.n_seg, spec.t_seg, r).transpose(0, 2, 1)
    new_counts = jnp.minimum(cT.reshape(-1), s)
    return out, new_counts, overflow


def _leaf_sort(
    ops: List[jax.Array],
    planes_slice: slice,
    valid: jax.Array,
    plan: MsdPlan,
    use_pallas: bool,
) -> Tuple[List[jax.Array], jax.Array]:
    """Sort each final segment by the remaining key bits, stably.

    ``valid``: (nseg, seg) bool validity.  Returns (ops sorted within
    segments: valid prefix per segment, followed by garbage; per-segment
    valid counts).
    """
    nseg, seg = plan.n_segments, plan.seg
    tiled = [o.reshape(nseg, seg) for o in ops]
    planes = tiled[planes_slice]
    nplanes = planes_slice.stop - (planes_slice.start or 0)

    seg_counts = valid.sum(axis=1, dtype=jnp.int32)

    # idx field must have headroom above seg-1 so the per-segment garbage
    # sentinel (all-ones rem, all-ones idx) sorts strictly after every valid
    # element of its segment
    idx_bits = (seg - 1).bit_length()
    if seg >= (1 << idx_bits):
        idx_bits += 1
    idx = jnp.arange(seg, dtype=jnp.uint32)[None, :]
    rem = _extract_bits(planes, plan.rem_lo, plan.rem_width).reshape(nseg, seg)

    # keys are reconstructible from (segment prefix | rem) — so the key
    # plane need not be carried through the leaf sort — when the partitions
    # + remainder cover the full single-plane key and every pass used its
    # full digit width (then segment linear index == bit prefix)
    consumed = sum(sp.width for sp in plan.passes)
    full_width = all(
        sp.width == sp.r.bit_length() - 1 for sp in plan.passes
    )
    key_from_sortkey = (
        nplanes == 1
        and plan.rem_lo == 0
        and consumed + plan.rem_width == 32
        and full_width
    )

    if plan.rem_width + idx_bits + 1 <= 32:
        # pack several segments per tile (segid high bits keep each
        # segment's garbage at its own end); bigger tiles amortize grid
        # overheads in the bitonic kernel
        max_tile = 16384
        pack = 1
        while (
            pack * 2 * seg <= max_tile
            and nseg % (pack * 2) == 0
            and (pack * 2 - 1).bit_length() + plan.rem_width + idx_bits <= 32
        ):
            pack *= 2
        segid_bits = (pack - 1).bit_length()
        shift_rem = jnp.uint32(idx_bits)
        sortkey = jnp.where(
            valid,
            (rem << shift_rem) | idx,
            jnp.uint32(((1 << (plan.rem_width + idx_bits)) - 1)),
        )
        if segid_bits:
            segid = (
                jnp.arange(nseg, dtype=jnp.uint32)[:, None] % pack
            ) << jnp.uint32(plan.rem_width + idx_bits)
            sortkey = sortkey | segid
        carried = tiled[1:] if key_from_sortkey and nplanes == 1 else tiled
        to_sort = [sortkey.reshape(nseg // pack, pack * seg)] + [
            o.reshape(nseg // pack, pack * seg) for o in carried
        ]
        if use_pallas:
            from tpusort.kernels.bitonic import sort_tiles

            sorted_all = list(sort_tiles(to_sort))
        else:
            sorted_all = _sort_tiles_xla(to_sort)
        sorted_key = sorted_all[0].reshape(nseg, seg)
        sorted_ops = [o.reshape(nseg, seg) for o in sorted_all[1:]]
        if key_from_sortkey:
            # rebuild the key plane: segment prefix | rem
            prefix = jnp.arange(nseg, dtype=jnp.uint32)[:, None]
            rem_sorted = (sorted_key >> shift_rem) & jnp.uint32(
                (1 << plan.rem_width) - 1
            )
            rebuilt = (prefix << jnp.uint32(plan.rem_width)) | rem_sorted
            sorted_ops = [rebuilt] + sorted_ops
    else:
        # wide remainder (64-bit keys / few passes): multi-key stable sort on
        # the range-masked planes, with the position index as tiebreak.
        from tpusort.ops.reference import _mask_plane_bits

        masked = _mask_plane_bits(
            tuple(planes), plan.rem_lo, plan.rem_lo + plan.rem_width,
            32 * len(planes),
        )
        keys = [jnp.where(valid, mp, jnp.uint32(0xFFFFFFFF)) for mp in masked]
        keys.append(jnp.where(valid, idx, jnp.uint32(0xFFFFFFFF)))
        sorted_ops = list(
            jax.lax.sort(
                keys + tiled, dimension=1, num_keys=len(keys),
                is_stable=False
            )
        )[len(keys):]
    return [o.reshape(-1) for o in sorted_ops], seg_counts


def _compact_xla(
    ops: List[jax.Array], seg_counts: jax.Array, seg: int, n: int
) -> List[jax.Array]:
    """Order-preserving drop of per-segment garbage tails -> dense (n,)."""
    offsets = jnp.cumsum(seg_counts) - seg_counts            # (nseg,)
    j = jnp.arange(n, dtype=jnp.int32)
    segid = jnp.searchsorted(offsets, j, side="right") - 1
    src = segid * seg + (j - offsets[segid])
    return [o[src] for o in ops]


def sort_twiddled_msd(
    planes: Tuple[jax.Array, ...],
    values: Sequence[jax.Array],
    *,
    begin_bit: int,
    end_bit: int,
    total_bits: int,
    use_pallas: Optional[bool] = None,
    plan_kwargs: Optional[dict] = None,
    stable: bool = True,
    skew_tier: Optional[bool] = None,
    on_overflow: str = "cond",
    config=None,
):
    """MSD hybrid engine entry (engine-registry signature).

    ``stable=False`` enables the unstable raw-key pairs fast path (the
    reference's ``rdxsrt_unstable_sort_pairs`` semantics,
    ``msb/src/sort/gpu_radix_sort.h:544``): keys+values ride a 2-operand
    raw-key network instead of the 3-operand (digit,idx)-sortkey network.
    Falls back when no feasible plan exists (small n, narrow bit ranges)
    or — via lax.cond — when run overflow reveals a skewed distribution
    the static padding cannot absorb (or, unstable-pairs only, when some
    valid key equals 0xFFFFFFFF and would tie the garbage sentinel).

    ``skew_tier`` (default: on for keys-only single-plane u32 full-range,
    n < 2^28, pallas): route the overflow fallback through the equi-depth
    splitter engine (~300-400 M keys/s on skewed inputs) before the exact
    reference sort — the analog of the reference's dynamic hot-bucket
    handling (``cuda_radix_sort.h:437-447``) engaging only when the radix
    path's static capacities overflow.  Disabled above 2^28 (the nested
    branch workspace reservation would exceed HBM) and inside the skew
    tier's own sampling sort (no recursive tiers).

    ``on_overflow="flag"``: skip the in-graph ``lax.cond`` fallback and
    return ``(planes, values, overflow)`` instead — the caller owns the
    fallback decision (host-side re-sort, error, retry).  This removes
    the fallback branch's workspace RESERVATION, which is what caps the
    in-graph engine at 2^29 keys on a 16 GB chip: flag mode runs 2^30.
    """
    flag_mode = on_overflow == "flag"
    n = planes[0].shape[0]
    if plan_kwargs is None and config is not None:
        # the registered tuning config steers the planner (the reference's
        # RadixSortConfig TPB/KPT analog, gpu_sort_config.h:146-207)
        plan_kwargs = config.plan_kwargs()
    if skew_tier is None and config is not None:
        skew_tier = config.skew_tier
    single_tile_max = (
        config.small_n_threshold if config is not None else 1 << 14
    )
    kwargs = dict(plan_kwargs or {})
    min_n = kwargs.pop("min_n", 1 << 16)
    # leaf-variant profile for the cost model: raw-key paths (keys-only /
    # unstable pairs / composite stable, full-range) have width-independent
    # leaves; everything else packs (rem, idx) and pays by remaining bits
    raw_leaf = (
        (use_pallas if use_pallas is not None
         else jax.default_backend() == "tpu")
        and len(planes) <= 3
        and (not values or not stable)
        and begin_bit == 0
        and end_bit == total_bits == 32 * len(planes)
    )
    kwargs.setdefault("leaf_profile", "raw" if raw_leaf else "packed")
    plan = None
    if n >= min_n:
        plan = plan_msd(n, begin_bit, end_bit, **kwargs)
    if any(jnp.dtype(v.dtype).itemsize != 4 for v in values):
        plan = None  # non-32-bit payloads: delegate (API splits 64-bit later)
    if plan is not None and not flag_mode and n > (1 << 29):
        # the cond fallback branch would RESERVE the reference sort's
        # workspace on top of the pipeline's live set (> HBM above 2^29);
        # in-graph callers get the reference path, flag-mode callers the
        # full pipeline
        plan = None
    if plan is None:
        if (
            (use_pallas if use_pallas is not None
             else jax.default_backend() == "tpu")
            and n + ((-n) % 128) <= min(single_tile_max, 1 << 14)
            and (not values or not stable)
        ):
            # single-tile fast path (CUB InvokeSingleTile analog,
            # dispatch_radix_sort.cuh:834-875)
            from tpusort.ops.small import sort_twiddled_bitonic

            sp, sv = sort_twiddled_bitonic(
                planes, values, begin_bit=begin_bit, end_bit=end_bit,
                total_bits=total_bits,
            )
        else:
            sp, sv = sort_twiddled_reference(
                planes, values, begin_bit=begin_bit, end_bit=end_bit,
                total_bits=total_bits,
            )
        return (sp, sv, jnp.asarray(False)) if flag_mode else (sp, sv)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    nplanes = len(planes)
    # NOTE (round-3 on-chip verdict): the gather-apply and u16-subtile pass
    # variants were DELETED.  Mosaic lowers take_along_axis only within one
    # vreg (lane gathers over a 128 window, ~20 Gelem/s); the cross-vreg
    # wide-row gathers those kernels needed ("Multiple source vregs along
    # gather dimension") and sublane gathers do not lower at all, and the
    # 16-bit network cannot lower either (no u16 roll).  Payload operands
    # therefore ride the compare-exchange network (see DESIGN.md).
    if (
        stable
        and values
        and use_pallas
        and nplanes == 1
        and begin_bit == 0
        and end_bit == total_bits == 32
    ):
        # stable pairs via the composite 64-bit key (key, position): the
        # position plane is unique, so the unstable 2-plane raw path is
        # stable-by-key — and its 0xFFFFFFFF sentinel pre-check can never
        # fire on the position plane.  +16% over the (digit,idx)-sortkey
        # path and shares all raw-path machinery (merge networks, network
        # leaf).
        gidx = jnp.arange(n, dtype=jnp.uint32)
        # gather-apply (config.pairs_gather_apply): payloads do NOT ride
        # the compare-exchange network (each extra operand costs ~30-50%
        # of the whole chain) — the sorted position plane IS the
        # permutation, so payloads are applied afterwards with one XLA
        # gather each (the rank-then-gather discipline of the reference's
        # downsweep, agent_radix_sort_downsweep.cuh:439-471, hoisted to
        # whole-array granularity).  mode="clip" keeps the gather safe
        # when flag-mode overflow leaves the permutation plane garbage
        # (the caller discards the output).
        gather_apply = bool(config is not None and config.pairs_gather_apply)
        res = sort_twiddled_msd(
            (planes[0], gidx), () if gather_apply else values,
            begin_bit=0, end_bit=64,
            total_bits=64, use_pallas=use_pallas, plan_kwargs=plan_kwargs,
            stable=False, on_overflow=on_overflow, config=config,
        )
        if gather_apply:
            pidx = res[0][1].astype(jnp.int32)
            out_vals = tuple(
                jnp.take(jnp.asarray(v), pidx, unique_indices=True,
                         mode="clip")
                for v in values
            )
        else:
            out_vals = res[1]
        if flag_mode:
            return ((res[0][0],), out_vals, res[2])
        return (res[0][0],), out_vals
    if (
        stable
        and values
        and use_pallas
        and nplanes == 2
        and begin_bit == 0
        and end_bit == total_bits == 64
        and config is not None
        and config.pairs_gather_apply
    ):
        # stable 64-bit pairs via the composite 96-bit key (hi, lo,
        # position): a 3-plane raw-key sort (the networks and leaf take
        # num_keys generically) whose position plane doubles as the
        # payload permutation — replacing the general sortkey path's 4
        # network operands AND its ~5x XLA multikey leaf.
        gidx = jnp.arange(n, dtype=jnp.uint32)
        res = sort_twiddled_msd(
            (planes[0], planes[1], gidx), (), begin_bit=0, end_bit=96,
            total_bits=96, use_pallas=use_pallas, plan_kwargs=plan_kwargs,
            stable=False, on_overflow=on_overflow, config=config,
        )
        pidx = res[0][2].astype(jnp.int32)
        out_vals = tuple(
            jnp.take(jnp.asarray(v), pidx, unique_indices=True, mode="clip")
            for v in values
        )
        if flag_mode:
            return ((res[0][0], res[0][1]), out_vals, res[2])
        return (res[0][0], res[0][1]), out_vals
    # 32-bit word split for payloads is handled at the API layer; here all
    # operands are uint32.
    ops = [jnp.pad(p, (0, plan.m1 - n)) for p in planes]
    ops += [jnp.pad(jnp.asarray(v).view(jnp.uint32), (0, plan.m1 - n))
            for v in values]
    planes_slice = slice(0, nplanes)

    raw_ok = (
        use_pallas
        and nplanes <= 3
        and (not values or not stable)
        and plan.rem_lo == 0
        and begin_bit == 0
        and end_bit == total_bits
        and total_bits == 32 * nplanes
    )
    if use_pallas:
        ops, (ctable, q_fin), overflow = _run_passes_pallas(
            ops, nplanes, n, plan, unstable=(raw_ok and bool(values)),
            batch=(config.pass_batch if config is not None else None),
        )
    else:
        ops, valid_u8, overflow = _run_passes_xla(
            ops, planes_slice, n, plan
        )
    if raw_ok and values:
        # raw-key pairs: a valid key equal to the garbage sentinel would tie
        # it and could swap payloads with a dropped pad slot -> fall back
        is_max = planes[0] == jnp.uint32(0xFFFFFFFF)
        for p_ in planes[1:]:
            is_max = is_max & (p_ == jnp.uint32(0xFFFFFFFF))
        overflow |= jnp.any(is_max)

    if raw_ok:
        # raw-key leaf: segment prefixes ascend in digit-major order and are
        # part of the key, so sorting packed tiles of whole segments by the
        # raw key (garbage -> 0xFFFFFFFF) both finishes each segment and
        # compacts valid keys to the tile front in globally sorted order.
        from tpusort.kernels.bitonic import sort_tiles_counts_collapsed

        # pack whole segments per leaf tile up to 2^15 elements.  (Growing
        # to 2^16 for a transposed-layout-eligible staged shape was tried
        # on chip and LOST: the bigger staged tail costs more stages than
        # the cheap-axis mapping saves — 761 vs 818 M keys/s at 2^28.)
        pack = 1
        while (
            pack * 2 * plan.seg <= (1 << 15)
            and plan.n_segments % (pack * 2) == 0
        ):
            pack *= 2
        nt = plan.n_segments // pack
        tile = pack * plan.seg
        ct = ctable.reshape(nt, tile // q_fin)
        last_s = plan.passes[-1].s
        # fused leaf + collapse: sorted valid prefixes stream straight to
        # their dense output offsets (offsets = the counts chain's cumsum,
        # known before the kernel) — no separate compaction pass
        ops = sort_tiles_counts_collapsed(
            [o.reshape(nt, tile) for o in ops], ct, q_fin, n,
            sorted_run=(last_s & -last_s),
            num_keys=nplanes,
        )
    else:
        if use_pallas:
            ct = ctable.reshape(plan.n_segments, plan.seg // q_fin)
            valid_arr = (
                jnp.arange(q_fin, dtype=jnp.int32)[None, None, :]
                < ct[:, :, None]
            ).reshape(plan.n_segments, plan.seg)
        else:
            valid_arr = valid_u8.reshape(plan.n_segments, plan.seg) != 0
        ops, seg_counts = _leaf_sort(
            ops, planes_slice, valid_arr, plan, use_pallas,
        )
        if use_pallas:
            from tpusort.kernels.collapse import collapse_segments

            ops = collapse_segments(
                [o.reshape(plan.n_segments, plan.seg) for o in ops],
                seg_counts, n,
            )
        else:
            ops = _compact_xla(ops, seg_counts, plan.seg, n)

    if skew_tier is None:
        skew_tier = (
            use_pallas
            and not values
            and nplanes == 1
            and begin_bit == 0
            and end_bit == total_bits == 32
            and n < (1 << 28)
        )

    def _fallback(_):
        # keys-only guard: with values the equidepth branch would return
        # nplanes arrays while _ok returns nplanes+nvalues (lax.cond pytree
        # mismatch if a config forces skew_tier=True for a pairs shape);
        # pairs get the universal equidepth tier via the HOST-owned chain
        # (api._sort_host_tiered), which this in-graph branch mirrors only
        # for the keys-only case
        if skew_tier and not values:
            from tpusort.ops.equidepth import sort_twiddled_equidepth

            sp, _ = sort_twiddled_equidepth(
                planes, (), begin_bit=begin_bit, end_bit=end_bit,
                total_bits=total_bits, use_pallas=use_pallas,
            )
            return list(sp)
        sp, sv = sort_twiddled_reference(
            planes, values, begin_bit=begin_bit, end_bit=end_bit,
            total_bits=total_bits,
        )
        return list(sp) + [jnp.asarray(v).view(jnp.uint32) for v in sv]

    def _ok(_):
        return ops

    if not flag_mode:
        ops = jax.lax.cond(overflow, _fallback, _ok, None)

    out_planes = tuple(ops[:nplanes])
    out_values = tuple(
        o.view(jnp.asarray(v).dtype) for o, v in zip(ops[nplanes:], values)
    )
    if flag_mode:
        return out_planes, out_values, overflow
    return out_planes, out_values


def _exchange(o: jax.Array, spec: PassSpec) -> jax.Array:
    """Digit-major global exchange within each segment (free XLA transpose)."""
    o4 = o.reshape(spec.n_seg, spec.t_seg, spec.r, spec.s)
    return o4.transpose(0, 2, 1, 3).reshape(-1)


def _run_passes_pallas(
    ops: List[jax.Array], nplanes: int, n: int, plan: MsdPlan,
    unstable: bool = False, batch: Optional[int] = None,
    init_chain: Optional[Tuple[jax.Array, int, int]] = None,
) -> Tuple[List[jax.Array], Tuple[jax.Array, int], jax.Array]:
    """All partition passes via the fused kernel.

    Validity rides as tiny per-subrun counts tables (never per-element
    bytes): each pass emits (T, R) counts; the table for the next consumer
    is the exchanged, pow2-granularity subdivision of those counts.
    Returns (ops, (counts_table (m/q,), q), overflow).

    ``init_chain`` = (counts_table, q, sorted_run) seeds pass 0 with an
    EXISTING validity chain and sorted-subrun structure instead of the
    dense [0, n) prefix — the sorted-window finish path (the input is
    already a padded layout of sorted runs; with sorted_run == K pass 0
    skips its network entirely and becomes emit-only).
    """
    from tpusort.kernels.partition import partition_pass_fused

    ctable = None
    q = None
    overflow = jnp.asarray(False)
    prev_s = None
    if init_chain is not None:
        ctable, q, prev_s = init_chain
    for i, spec in enumerate(plan.passes):
        t = spec.n_seg * spec.t_seg
        tiled = [o.reshape(t, spec.k) for o in ops]
        cin = None if ctable is None else ctable.reshape(t, spec.k // q)
        # emitted windows are monotone slices of fully sorted tiles, so the
        # largest pow2 divisor of the previous pass's run size gives sorted
        # subruns -> merge network instead of full sort (keys-only path)
        sorted_run = None if prev_s is None else (prev_s & -prev_s)
        data, counts = partition_pass_fused(
            tiled[:nplanes],
            tiled[nplanes:],
            cin,
            q_in=q,
            r=spec.r,
            s=spec.s,
            lo_bit=spec.lo_bit,
            width=spec.width,
            n=(n if ctable is None else None),
            sorted_run=sorted_run,
            unstable=unstable,
            t_seg=spec.t_seg,
            batch=(batch or 4),
        )
        prev_s = spec.s
        overflow |= jnp.any(counts > spec.s)
        # kernel wrote the digit-major exchanged layout directly (fused
        # exchange); outputs are already flat (n_seg*r*t_seg*s,).  Build the
        # next validity table in the same layout, subdivided to the largest
        # pow2 granularity of this pass's run size.
        q = spec.s & -spec.s
        chunks = spec.s // q
        c = jnp.minimum(counts, spec.s).reshape(
            spec.n_seg, spec.t_seg, spec.r
        ).transpose(0, 2, 1)
        c = jnp.clip(
            c[..., None] - jnp.arange(chunks, dtype=jnp.int32) * q, 0, q
        )
        ctable = c.reshape(-1)
        ops = data
    return ops, (ctable, q), overflow


def sort_windows_msd(
    planes: Tuple[jax.Array, ...],
    values: Sequence[jax.Array],
    *,
    window_counts: jax.Array,
    window: int,
    n: int,
    total_bits: int,
    plan_kwargs: Optional[dict] = None,
    config=None,
):
    """Finish a padded-window layout that is ALREADY sorted per window.

    Inputs are flat (m0,) arrays, m0 = n_windows * window; window w holds
    a SORTED valid prefix of ``window_counts[w]`` elements followed by
    positional garbage.  This is the distributed sorted-window finish
    (DESIGN.md r5): the post-shuffle receive buffer's runs are monotone
    slices of locally sorted shards, so the finish need not re-sort from
    scratch — the window counts seed the engine's validity chain at tile
    granularity and ``sorted_run = K`` makes pass 0 EMIT-ONLY (no
    compare-exchange network); later passes and the leaf run the standard
    merge pipeline and the fused leaf+collapse emits the dense (n,)
    result.  The reference analog is its finished buckets writing straight
    to the output and skipping remaining passes
    (``msb/src/sort/gpu_radix_sort.h:359-360``) — here it is the
    *incoming* sortedness that is never discarded.

    Keys-only or unstable pairs (values ride the raw path; the caller owns
    the 0xFFFFFFFF sentinel pre-check when values are present, as in
    ``sort_twiddled_msd``'s raw path).  Returns ``(ops, overflow)`` with
    ops = [planes..., values...] dense (n,), or ``None`` when the geometry
    does not admit a windows plan (caller falls back to
    collapse-then-sort).
    """
    nplanes = len(planes)
    ops = [jnp.asarray(p) for p in planes] + [
        jnp.asarray(v).view(jnp.uint32) for v in values
    ]
    m0 = ops[0].shape[0]
    if plan_kwargs is None and config is not None:
        plan_kwargs = config.plan_kwargs()
    kwargs = dict(plan_kwargs or {})
    kwargs.pop("min_n", None)
    kwargs.setdefault("leaf_profile", "raw")
    k = kwargs.get("k", 1 << 16)
    if nplanes > 3 or total_bits != 32 * nplanes:
        return None
    if m0 % k or window % k or m0 // window < 1:
        return None
    plan = plan_msd(n, 0, total_bits, t1_force=m0 // k, **kwargs)
    if plan is None or plan.m1 != m0:
        return None
    # validity chain at tile granularity: tile j of window w holds
    # clip(count_w - j*K, 0, K) valid elements as a prefix (tiles never
    # straddle windows: window % K == 0)
    tiles_per_w = window // k
    c0 = jnp.clip(
        window_counts.astype(jnp.int32)[:, None]
        - jnp.arange(tiles_per_w, dtype=jnp.int32)[None, :] * k,
        0, k,
    ).reshape(-1)
    ops, (ctable, q_fin), overflow = _run_passes_pallas(
        ops, nplanes, n, plan, unstable=bool(values),
        batch=(config.pass_batch if config is not None else None),
        init_chain=(c0, k, k),
    )
    from tpusort.kernels.bitonic import sort_tiles_counts_collapsed

    pack = 1
    while (
        pack * 2 * plan.seg <= (1 << 15)
        and plan.n_segments % (pack * 2) == 0
    ):
        pack *= 2
    nt = plan.n_segments // pack
    tile = pack * plan.seg
    ct = ctable.reshape(nt, tile // q_fin)
    last_s = plan.passes[-1].s
    ops = sort_tiles_counts_collapsed(
        [o.reshape(nt, tile) for o in ops], ct, q_fin, n,
        sorted_run=(last_s & -last_s),
        num_keys=nplanes,
    )
    return ops, overflow


def _run_passes_xla(
    ops: List[jax.Array], planes_slice: slice, n: int, plan: MsdPlan
) -> Tuple[List[jax.Array], jax.Array, jax.Array]:
    """Reference XLA pass pipeline (CPU-runnable; counts-derived validity).
    Returns (ops, final validity as (m,) uint8, overflow)."""
    k0 = plan.passes[0].k
    t0 = plan.m1 // k0
    run_counts = jnp.clip(
        n - jnp.arange(t0, dtype=jnp.int32) * k0, 0, k0
    )
    s_prev = k0
    overflow = jnp.asarray(False)
    for spec in plan.passes:
        ops, run_counts, ovf = _partition_pass(
            ops, planes_slice, run_counts, s_prev, spec, False
        )
        overflow |= ovf
        s_prev = spec.s
    valid = _valid_mask(
        run_counts, s_prev, plan.n_segments, plan.seg
    ).astype(jnp.uint8).reshape(-1)
    return ops, valid, overflow
