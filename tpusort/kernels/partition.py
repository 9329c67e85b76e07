"""Pallas TPU partition-pass kernels: fully fused MSD radix pass.

The TPU-native replacement for the reference's histogram + partition/scatter
kernel pair (``msb/src/sort/cuda_radix_sort.h:666-802`` ``rdxsrt_histogram``,
``:374-641`` ``rdxsrt_partition_keys``): where the CUDA code runs a separate
histogram kernel, a planner, then a scatter kernel with atomics on shared
memory bucket offsets, this kernel fuses the entire pass per VMEM tile:

  1. derives per-element validity from the previous pass's tiny counts
     table (SMEM; slot j of a subrun is valid iff j < count — pass 0 uses
     the element index vs n), so no per-element validity bytes touch HBM,
  2. sorts the tile with a batched bitonic compare-exchange network (the
     keys-only single-plane path sorts the *raw key plane* one-operand, with
     garbage slots rewritten to 0xFFFFFFFF — multiset-exact for keys-only
     because replacements equal anything they can displace; the general path
     sorts a (digit, idx) sortkey carrying planes/payloads),
  3. computes run starts/counts from the *sorted* tile with compare-reduces
     (the histogram, for free — no separate kernel, no atomics),
  4. expands the R digit runs to padded capacity S with dynamic-start
     element-granular VMEM slices and writes the (R*S,) padded tile plus
     an (R,) counts row (the next pass's validity table).

The digit-major global exchange is then a free XLA transpose outside the
kernel.  Per-run capacity overflow (skew) is detected from the counts output
by the caller (the analog of the reference's hot-bucket trigger,
``cuda_radix_sort.h:437-447``).

Batching NB tiles per grid step overlaps the otherwise latency-bound serial
compare-exchange chain (measured +45% on v5e).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusort.kernels.bitonic import (
    LANES, _VMEM_LIMIT, _from_col, _linear_pos, _merge_sorted_runs,
    _sort_network, _t_layout_ok, _to_col, _valid_from,
)



def _dynamic_run_slice(scratch_ref, start, srows: int) -> jax.Array:
    """Elements [start, start + srows*128) of the row-major scratch ref
    (rows+srows+1, 128), as (srows, 128).  ``start`` is a traced element
    offset; dynamic slicing happens on the ref (sublane start) plus a
    dynamic lane rotate + boundary select."""
    r0 = start >> 7
    l0 = start & 127
    win = scratch_ref[pl.ds(r0, srows + 1), :]
    # rolled[i, j] = win[i, (j + l0) mod 128]
    rolled = pltpu.roll(win, (128 - l0) & 127, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (srows, LANES), 1)
    take_same_row = lane < (128 - l0)
    return jnp.where(take_same_row, rolled[:srows], rolled[1 : srows + 1])


def _extract_bits_arrays(
    planes: Sequence[jax.Array], lo: int, width: int
) -> jax.Array:
    """Bits [lo, lo+width) of the multi-plane key (plane 0 = most
    significant 32 bits), as uint32.  Mirrors ops.msd._extract_bits."""
    nplanes = len(planes)
    out = None
    for i, pl_ in enumerate(planes):
        base = 32 * (nplanes - 1 - i)
        ov_lo = max(lo, base)
        ov_hi = min(lo + width, base + 32)
        if ov_hi <= ov_lo:
            continue
        m = jnp.uint32((1 << (ov_hi - ov_lo)) - 1)
        chunk = (pl_ >> jnp.uint32(ov_lo - base)) & m
        chunk = chunk << jnp.uint32(ov_lo - lo)
        out = chunk if out is None else out | chunk
    if out is None:
        return jnp.zeros_like(planes[0])
    return out


def _emit_runs(
    sorted_arrays: List[jax.Array],
    starts,            # list of per-(b) lists of scalar starts, or callable
    counts,            # per-(b, d) scalar counts
    outs,              # data outs
    counts_ref,
    scratch,
    *,
    nb: int,
    r: int,
    s: int,
    exchanged: bool = False,
):
    """Slice R runs per tile out of the sorted scratch into padded outputs,
    and write the counts row (the validity carrier — downstream validity is
    positional: slot j of run d is valid iff j < counts[d]).  ``exchanged``:
    outputs are (1, r, nb, srows, LANES) digit-major blocks (fused global
    exchange); otherwise (nb, r*srows, LANES) tile-major."""
    rows = sorted_arrays[0].shape[1]
    srows = s // LANES
    for sc, a in zip(scratch, sorted_arrays):
        for b in range(nb):
            sc[b, :rows] = a[b]
    for b in range(nb):
        for d in range(r):
            st = starts[b][d]
            for o, sc in zip(outs, scratch):
                run = _dynamic_run_slice(sc.at[b], st, srows)
                if exchanged:
                    o[0, d, b] = run
                else:
                    o[b, d * srows : (d + 1) * srows] = run
            counts_ref[b, 0, d] = counts[b][d]


def _fused_kernel(
    *refs,
    n_planes: int,
    n_values: int,
    nb: int,
    r: int,
    s: int,
    k: int,
    lo_bit: int,
    width: int,
    idx_bits: int,
    n: Optional[int],
    q_in: Optional[int],
    keys_only_fast: bool,
    sorted_run: Optional[int],
    exchanged: bool,
    digit_input: bool = False,
    splitter_input: bool = False,
):
    # refs layout:
    #   ins:  [digit (if digit_input)], planes x n_planes,
    #         values x n_values, [splitters (SMEM)], [counts_in (SMEM)]
    #   outs: ops x (n_planes + n_values), counts
    #   scratch: x n_data
    n_data = n_planes + n_values
    di = 1 if digit_input else 0
    digit_ref = refs[0] if digit_input else None
    ins = refs[di : di + n_data]
    pos = di + n_data
    spl_refs = None
    frac_ref = None
    if splitter_input:
        spl_refs = refs[pos : pos + n_planes]
        frac_ref = refs[pos + n_planes]
        pos += n_planes + 1
    cin_ref = refs[pos] if q_in is not None else None
    pos += 1 if q_in is not None else 0
    outs = refs[pos : pos + n_data]
    counts_ref = refs[pos + n_data]
    scratch = refs[pos + n_data + 1 :]

    rows = k // LANES
    valid = _valid_from(cin_ref, q_in or 0, nb, rows, k, n)
    planes = [ins[i][...] for i in range(n_planes)]
    values = [ins[n_planes + i][...] for i in range(n_values)]
    wmask = jnp.uint32((1 << width) - 1)

    if keys_only_fast:
        # raw-key fast path: sort the key plane itself; garbage slots become
        # 0xFFFFFFFF, which sorts past / ties with only equal keys.  For
        # keys-only the output multiset is exact; with payloads the caller
        # pre-checks globally that no valid key equals 0xFFFFFFFF (else the
        # overflow fallback fires), so ties never mix payloads.  Unstable
        # for pairs — the analog of the reference's rdxsrt_unstable_sort
        # (msb/src/sort/gpu_radix_sort.h:197).
        kplanes = [
            jnp.where(valid, p_, jnp.uint32(0xFFFFFFFF)) for p_ in planes
        ]
        # lane-level sub-vreg rotates are the expensive stages on v5e
        # (~2.3x a sublane rotate, r4 decomp): run the network on the
        # COLUMN-MAJOR tile (same linear element order, low index bits on
        # the sublane axis — bitonic._bit; S=512 at K=2^16 leaves only 28
        # lane-rotate stages in the full sort vs 91 row-major).
        ops_net = kplanes + values
        if sorted_run and sorted_run >= k:
            # the whole tile is already sorted (a window of a presorted
            # padded layout: valid prefix ascending, garbage tail
            # rewritten to the all-ones sentinel above) — the pass is
            # EMIT-ONLY: no network, no layout transposes (the
            # sorted-window finish, DESIGN.md r5)
            sorted_all = ops_net
        else:
            t_lay = _t_layout_ok(rows)
            if t_lay:
                ops_net = [_to_col(a, t_lay) for a in ops_net]
            if sorted_run:
                # input windows are monotone slices of previously sorted
                # tiles; garbage tails rewritten to 0xFFFFFFFF keep each
                # pow2-aligned subrun sorted, so a merge network suffices
                # (60-69 stages vs 105 for the full sort)
                sorted_all = _merge_sorted_runs(
                    ops_net, sorted_run, num_keys=n_planes, t_layout=t_lay
                )
            else:
                sorted_all = _sort_network(ops_net, num_keys=n_planes,
                                           t_layout=t_lay)
            if t_lay:
                sorted_all = [_from_col(a, t_lay) for a in sorted_all]
        n_valid = [
            jnp.sum(valid[b].astype(jnp.int32)) for b in range(nb)
        ]
        starts = []
        counts = []
        if splitter_input:
            # equi-depth range buckets: the sorted tile's buckets are
            # contiguous, so the cut point for bucket d is any position in
            # the legal tie range [a_d, b_d] (a = #keys < s_d, b = #keys
            # <= s_d: boundary-valued keys may sit on either side because
            # they are equal across all tiles).  The cut targets the
            # PROPORTIONAL position a + f*(b-a) — f is the boundary's share
            # of the tied value per the quantile table — so every pass's
            # tie allocation matches the deeper splitters (greedy capacity
            # fill hands boundary-straddling heavy values more than their
            # quantile share and guarantees a later overflow).  A cut
            # forced outside [max(a,prev), prev+s] means the sample
            # misjudged a bucket -> poison the counts so the caller's
            # overflow fallback fires.  Multi-plane keys (u64 / composite
            # stable pairs) compare lexicographically against per-plane
            # splitter words.
            sorted_planes_k = sorted_all[:n_planes]

            def _cmp_counts(b, d):
                """(#keys < splitter, #keys <= splitter) for tile b."""
                lt = None
                eq = None
                for pi in range(n_planes):
                    w = sorted_planes_k[pi][b]
                    sw = spl_refs[pi][b, 0, d - 1]
                    lt_i = w < sw
                    eq_i = w == sw
                    if lt is None:
                        lt, eq = lt_i, eq_i
                    else:
                        lt = lt | (eq & lt_i)
                        eq = eq & eq_i
                a_ = jnp.sum(lt.astype(jnp.int32))
                b_ = a_ + jnp.sum(eq.astype(jnp.int32))
                return a_, b_

            for b in range(nb):
                st = [jnp.int32(0)]
                bs = [jnp.int32(0)]
                flag = jnp.int32(0)
                tile_id = pl.program_id(0) * nb + b
                for d in range(1, r):
                    fd = frac_ref[b, 0, d - 1]
                    a_d, b_d = _cmp_counts(b, d)
                    lo = jnp.maximum(a_d, st[-1])
                    hi = st[-1] + s
                    flag = flag | (lo > hi).astype(jnp.int32)
                    # dithered rounding: per-tile tie counts are tiny (a
                    # heavy value spreads ~1-2 copies per strided tile), so
                    # plain floor(f*(b-a)) sends EVERY sub-unit share the
                    # same way and the aggregate split deviates from f by
                    # up to a whole tile-count (measured on zipf: 53% of a
                    # heavy boundary value sent above an f=0.83 cut).  A
                    # per-(tile, boundary) hash offset in [0, 2^16) makes
                    # the expected aggregate exactly f * mass.
                    u = (
                        (tile_id * jnp.int32(-1640531527)
                         + jnp.int32((d * 0x85EBCA6B) & 0x7FFFFFFF))
                        >> 15
                    ) & jnp.int32(0xFFFF)
                    # fd * span must be exact: span reaches K (a heavily
                    # tied tile, entropy-8/zipf at K = 2^16) and fd reaches
                    # 2^16, so the product needs the FULL uint32 range —
                    # int32 wraps negative and could place a cut past the
                    # tie-legal bound b_d (an order error, not just a
                    # capacity miss).  fd is clamped to 2^16 - 1 (the lone
                    # corner fd = span = 2^16 is the f = 1.0 greedy fill,
                    # which the hi/relief clamps already realize).
                    span = (b_d - a_d).astype(jnp.uint32)
                    fd_c = jnp.minimum(fd, jnp.uint32(0xFFFF))
                    prod = (
                        (fd_c * span + u.astype(jnp.uint32))
                        >> jnp.uint32(16)
                    ).astype(jnp.int32)
                    tgt = jnp.where(fd >= jnp.uint32(1 << 16),
                                    b_d, a_d + prod)
                    c_d = jnp.minimum(
                        jnp.minimum(jnp.maximum(tgt, lo), hi), n_valid[b]
                    )
                    st.append(c_d)
                    bs.append(b_d)
                # backward relief sweep: tie-rounding drift accumulates in
                # the uncapped top bucket; raise cuts from the top within
                # their tie-legal bound b_d (moved elements equal s_d, so
                # bucket membership stays order-exact).  A raise clipped by
                # b_d leaves counts > s, which the caller's overflow check
                # catches.
                st.append(n_valid[b])
                for d in range(r - 1, 0, -1):
                    st[d] = jnp.maximum(
                        st[d], jnp.minimum(st[d + 1] - s, bs[d])
                    )
                cn = [st[d + 1] - st[d] for d in range(r - 1)]
                last = n_valid[b] - st[r - 1]
                flag = flag | (last > s).astype(jnp.int32)
                # poison count 0 so jnp.any(counts > s) trips downstream
                cn = [jnp.where(flag > 0, jnp.int32(k + 1), cn[0])] + cn[1:]
                cn.append(last)
                starts.append(st[:r])
                counts.append(cn)
        else:
            sorted_digit = _extract_bits_arrays(
                sorted_all[:n_planes], lo_bit, width
            )
            for b in range(nb):
                st = [jnp.int32(0)]
                # starts from the sorted tile: garbage (digit == r-1
                # region) only affects the top run, whose count is
                # clamped by n_valid
                for d in range(1, r):
                    st.append(
                        jnp.sum(
                            (sorted_digit[b] < jnp.uint32(d)).astype(
                                jnp.int32)
                        )
                    )
                cn = [st[d + 1] - st[d] for d in range(r - 1)]
                cn.append(n_valid[b] - st[r - 1])
                starts.append(st)
                counts.append(cn)
        _emit_runs(
            sorted_all, starts, counts, outs, counts_ref,
            scratch, nb=nb, r=r, s=s, exchanged=exchanged,
        )
        return

    # general path: stable (digit, idx) sortkey; planes + values ride along.
    # The digit is either extracted key bits (radix) or a caller-computed
    # plane (e.g. equi-depth splitter buckets for skewed distributions).
    if digit_input:
        digit = digit_ref[...]
    else:
        digit = _extract_bits_arrays(planes, lo_bit, width)
    idx = _linear_pos(nb, rows).astype(jnp.uint32) & jnp.uint32(
        (1 << idx_bits) - 1
    )
    d_or_s = jnp.where(valid, digit, jnp.uint32(r))
    sortkey = (d_or_s << jnp.uint32(idx_bits)) | idx
    t_lay = _t_layout_ok(rows)
    ops_net = [sortkey] + planes + values
    if t_lay:
        ops_net = [_to_col(a, t_lay) for a in ops_net]
    sorted_all = _sort_network(ops_net, t_layout=t_lay)
    if t_lay:
        sorted_all = [_from_col(a, t_lay) for a in sorted_all]
    sorted_digit = sorted_all[0] >> jnp.uint32(idx_bits)   # r == garbage
    starts = []
    counts = []
    for b in range(nb):
        st = [jnp.int32(0)]
        for d in range(1, r + 1):
            st.append(
                jnp.sum((sorted_digit[b] < jnp.uint32(d)).astype(jnp.int32))
            )
        starts.append(st[:r])
        counts.append([st[d + 1] - st[d] for d in range(r)])
    _emit_runs(
        sorted_all[1:], starts, counts, outs, counts_ref,
        scratch, nb=nb, r=r, s=s, exchanged=exchanged,
    )


def partition_pass_fused(
    planes: Sequence[jax.Array],
    values: Sequence[jax.Array],
    counts_in: Optional[jax.Array],
    *,
    r: int,
    s: int,
    lo_bit: int,
    width: int,
    q_in: Optional[int] = None,
    n: Optional[int] = None,
    sorted_run: Optional[int] = None,
    unstable: bool = False,
    t_seg: Optional[int] = None,
    digit: Optional[jax.Array] = None,
    splitters: Optional[jax.Array] = None,
    splitter_fracs: Optional[jax.Array] = None,
    batch: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[List[jax.Array], jax.Array]:
    """One fused MSD partition pass over (T, K) tiles.

    planes/values: (T, K) uint32.  Validity is carried by tiny counts
    tables, never per-element bytes: ``counts_in`` is (T, K//q_in) int32 —
    subrun i of ``q_in`` elements holds counts_in[t, i] valid elements as a
    prefix — or None for pass 0 (then ``n`` gives the global valid prefix
    length).

    When ``t_seg`` (tiles per digit segment) is given, the digit-major
    global exchange is FUSED into the kernel's output block mapping: run d
    of tile (seg, j) is written directly to out[seg, d, j] — the XLA
    transpose between passes disappears.  Returns (exchanged ops flattened
    to (T*R*S,), counts (T, R) int32).  Without ``t_seg``, returns
    tile-major (T, R*S) arrays.  Counts may exceed ``s`` — the caller must
    check for overflow.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ops = [jnp.asarray(o) for o in list(planes) + list(values)]
    T, K = ops[0].shape
    if K % LANES or (K & (K - 1)) or s % LANES:
        raise ValueError(f"bad tile geometry K={K} S={s}")
    rows = K // LANES
    srows = s // LANES
    n_planes, n_values = len(planes), len(values)
    n_data = n_planes + n_values
    idx_bits = K.bit_length() - 1
    keys_only_fast = (
        digit is None and n_planes <= 3 and (n_values == 0 or unstable)
    )
    if splitters is not None and not keys_only_fast:
        raise ValueError("splitters mode requires the raw-key path")
    # max sortkey is (garbage digit r << idx_bits) | (K-1); reject wraps
    if not keys_only_fast and ((r + 1) << idx_bits) > (1 << 32):
        raise ValueError("sortkey overflow: (r+1) * K must fit in 32 bits")
    if counts_in is not None:
        if q_in is None or q_in % LANES or K % q_in:
            raise ValueError(f"bad validity granularity q_in={q_in}")

    nb = 4 if batch is None else batch
    while T % nb or (t_seg is not None and t_seg % nb):
        nb //= 2
    nb = max(nb, 1)

    shaped = [o.reshape(T, rows, LANES) for o in ops]
    inputs = list(shaped)
    if digit is not None:
        inputs.insert(0, jnp.asarray(digit).reshape(T, rows, LANES))
    in_specs = [
        pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(n_data + (1 if digit is not None else 0))
    ]
    if splitters is not None:
        if splitter_fracs is None:
            # greedy fill: ties pack earlier buckets to capacity
            splitter_fracs = jnp.full((T, r - 1), 1 << 16, jnp.uint32)
        spl_list = (
            list(splitters) if isinstance(splitters, (list, tuple))
            else [splitters]
        )
        if len(spl_list) != n_planes:
            raise ValueError("need one splitter word array per key plane")
        for arr in spl_list + [splitter_fracs]:
            inputs.append(
                jnp.asarray(arr).astype(jnp.uint32).reshape(T, 1, r - 1)
            )
            in_specs.append(
                pl.BlockSpec((nb, 1, r - 1), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM)
            )
    if counts_in is not None:
        n_sub = K // q_in
        inputs.append(
            jnp.asarray(counts_in).astype(jnp.int32).reshape(T, 1, n_sub)
        )
        in_specs.append(
            pl.BlockSpec((nb, 1, n_sub), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM)
        )

    if t_seg is None:
        data_shape = [
            jax.ShapeDtypeStruct((T, r * srows, LANES), jnp.uint32)
            for _ in range(n_data)
        ]
        data_spec = pl.BlockSpec((nb, r * srows, LANES),
                                 lambda t: (t, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        # exchanged layout: (n_seg, r, t_seg, srows, LANES); one grid step
        # writes all r runs of nb consecutive tiles of one segment
        n_seg = T // t_seg
        tb = t_seg // nb
        data_shape = [
            jax.ShapeDtypeStruct((n_seg, r, t_seg, srows, LANES), jnp.uint32)
            for _ in range(n_data)
        ]
        data_spec = pl.BlockSpec(
            (1, r, nb, srows, LANES),
            lambda t: (t // tb, 0, t % tb, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        functools.partial(
            _fused_kernel,
            n_planes=n_planes,
            n_values=n_values,
            nb=nb,
            r=r,
            s=s,
            k=K,
            lo_bit=lo_bit,
            width=width,
            idx_bits=idx_bits,
            n=n,
            q_in=(q_in if counts_in is not None else None),
            keys_only_fast=keys_only_fast,
            sorted_run=(sorted_run if keys_only_fast else None),
            exchanged=(t_seg is not None),
            digit_input=(digit is not None),
            splitter_input=(splitters is not None),
        ),
        out_shape=data_shape + [jax.ShapeDtypeStruct((T, 1, r), jnp.int32)],
        grid=(T // nb,),
        in_specs=in_specs,
        out_specs=[data_spec] * n_data
        + [
            # counts are written elementwise as scalars -> SMEM
            pl.BlockSpec((nb, 1, r), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, rows + srows + 1, LANES), jnp.uint32)
            for _ in range(n_data)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*inputs)
    if t_seg is None:
        data = [o.reshape(T, r * s) for o in out[:n_data]]
    else:
        data = [o.reshape(-1) for o in out[:n_data]]
    counts = out[n_data][:, 0, :]
    return data, counts


# ---------------------------------------------------------------------------
# Legacy interface (XLA-side sortkey/starts; used by tests for parity)
# ---------------------------------------------------------------------------


def _partition_kernel(starts_ref, *refs, n_data: int, r: int, s: int):
    # refs = [sortkey_in, data_in x n_data, data_out x n_data,
    #         scratch x n_data]
    ins = refs[: 1 + n_data]
    outs = refs[1 + n_data : 1 + 2 * n_data]
    scratch = refs[1 + 2 * n_data :]
    arrays = [ref[...] for ref in ins]        # (NB, rows, 128)
    arrays = _sort_network(arrays)
    nb, rows, _ = arrays[0].shape
    srows = s // LANES
    for sc, a in zip(scratch, arrays[1:]):
        for b in range(nb):
            sc[b, :rows] = a[b]                # tail rows stay garbage:
            # slots past a run's count are positionally invalid downstream
    for b in range(nb):
        for d in range(r):
            start = starts_ref[b, 0, d]
            for o, sc in zip(outs, scratch):
                o[b, d * srows : (d + 1) * srows] = _dynamic_run_slice(
                    sc.at[b], start, srows
                )


def partition_tiles(
    ops: Sequence[jax.Array],
    starts: jax.Array,
    *,
    r: int,
    s: int,
    batch: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> List[jax.Array]:
    """Fused sort+expand over tiles (sortkey + starts computed by caller).

    ops: [sortkey, data...] each (T, K) uint32; starts: (T, R) int32 run
    starts within the sorted tile.  Returns data operands expanded to
    (T, R*S) padded digit-run layout (sortkey is consumed, not emitted).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ops = [jnp.asarray(o) for o in ops]
    T, K = ops[0].shape
    if K % LANES or (K & (K - 1)) or s % LANES:
        raise ValueError(f"bad tile geometry K={K} S={s}")
    rows = K // LANES
    srows = s // LANES
    n_data = len(ops) - 1
    if batch is None:
        batch = 4
    nb = batch
    while T % nb:
        nb //= 2
    nb = max(nb, 1)
    shaped = [o.reshape(T, rows, LANES) for o in ops]

    out = pl.pallas_call(
        functools.partial(_partition_kernel, n_data=n_data, r=r, s=s),
        out_shape=[
            jax.ShapeDtypeStruct((T, r * srows, LANES), jnp.uint32)
            for _ in range(n_data)
        ],
        grid=(T // nb,),
        in_specs=[
            # starts padded to a lane row (TPU block tiling rules);
            # per-digit reads are static scalar loads
            pl.BlockSpec((nb, 1, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(1 + n_data)
        ],
        out_specs=[
            pl.BlockSpec((nb, r * srows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_data)
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, rows + srows + 1, LANES), jnp.uint32)
            for _ in range(n_data)
        ],
        interpret=interpret,
    )(
        jnp.pad(starts.astype(jnp.int32), ((0, 0), (0, LANES - r)))[:, None, :],
        *shaped,
    )
    return [o.reshape(T, r * s) for o in out]
