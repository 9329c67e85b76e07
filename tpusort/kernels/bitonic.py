"""Pallas TPU bitonic tile-sort kernel.

The TPU-native realization of the reference's in-register sorting networks
and block-local sorts (``msb/src/sort/sorting_network.cuh:26-816``,
``cub::BlockRadixSort::SortBlockedToStriped`` used by the leaf kernel at
``msb/src/sort/cuda_radix_sort.h:1601-1604``): a full bitonic
compare-exchange network over a VMEM-resident tile.

Why bitonic on TPU: the VPU has no gather/scatter/shuffle across lanes, but
compare-exchange networks need only *static power-of-two-distance* data
movement, which maps to cheap ``pltpu.roll`` on the sublane/lane axes plus
elementwise min/max/select.  Measured ~5-8x faster per element than XLA's
own ``lax.sort`` (DESIGN.md).

A tile of K = ROWS*128 uint32 elements is laid out as a (ROWS, 128) VMEM
block; linear element index i = row*128 + lane.  The first operand is the
sort key; any number of payload operands ride along through the same
selects.  Ties: the comparator never swaps equal keys, so payload selects
stay complementary (no duplication) — but the network is unstable; callers
needing stability pack a position index into the key.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# Per-kernel scoped-VMEM ceiling (Mosaic's default stack limit is 16 MB,
# which the 2^28 leaf + multi-operand staged merges exceed; the chip has
# 128 MB of VMEM and these kernels' real working sets are 20-30 MB).
_VMEM_LIMIT = 64 * 1024 * 1024

# Deferred-DMA stream buffers (the overlapped double-buffer collapse
# emit) are only enabled while the 2x per-operand stream scratch fits
# this budget; past it the kernels use single-buffer synchronous waits
# (the VMEM boundary-row relay is kept either way).  Shared with
# kernels/collapse.py — one knob, two kernels.
_DEFER_STREAM_LIMIT = 8 << 20


def _linear_pos(nb: int, rows: int) -> jax.Array:
    """(nb, rows, 128) int32: element index within each tile."""
    shape = (nb, rows, LANES)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return row * LANES + lane


def _valid_from(
    counts_ref, q: int, nb: int, rows: int, k: int, n,
    flat: bool = False,
):
    """Per-element validity.

    From the per-tile SMEM counts table (subrun i of ``q`` elements holds
    ``counts_ref[b, 0, i]`` valid elements as a prefix), or — pass 0, no
    table — from the global element index vs n.  The counts chain replaces
    the earlier u8 mask arrays: validity is fully determined by tiny
    per-run counts, so no per-element bytes ever touch HBM.

    ``flat``: build the mask in a flat (nb, K) lane layout instead of the
    (nb, rows, LANES) network layout.  ONE definition shared by the
    partition and leaf kernels so the counts-chain invariant can never
    drift between them.
    """
    if flat:
        lin = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 1)
        if counts_ref is not None:
            n_sub = k // q
            sub_pos = lin % q
            valid_rows = []
            for b in range(nb):
                thr = jnp.concatenate(
                    [
                        jnp.full((1, q), counts_ref[b, 0, i], jnp.int32)
                        for i in range(n_sub)
                    ],
                    axis=1,
                )
                valid_rows.append(sub_pos[b : b + 1] < thr)
            return jnp.concatenate(valid_rows, axis=0)
        base = pl.program_id(0) * (nb * k)
        off = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 0) * k
        return (base + off + lin) < n
    if counts_ref is not None:
        qrows = q // LANES
        n_sub = k // q
        shape = (rows, LANES)
        lin_sub = (
            jax.lax.broadcasted_iota(jnp.int32, shape, 0) % qrows
        ) * LANES + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        cols = []
        for b in range(nb):
            thr = jnp.concatenate(
                [
                    jnp.full((qrows, LANES), counts_ref[b, 0, i], jnp.int32)
                    for i in range(n_sub)
                ],
                axis=0,
            )
            cols.append(lin_sub < thr)
        return jnp.stack(cols, axis=0)
    pos = _linear_pos(nb, rows)
    base = pl.program_id(0) * (nb * k)
    off = jax.lax.broadcasted_iota(jnp.int32, (nb, rows, LANES), 0) * k
    return (base + off + pos) < n


def _bit(shape, bit: int, t_layout: int = 0):
    """Int32 (..., ROWS, LANES) array: tile-linear-index bit ``bit``.

    Leading batch dims (independent tiles) broadcast.  The physical
    layouts carry the same linear element order i:

    * default (``t_layout`` 0/False): element i at (row = i >> 7,
      lane = i & 127) — fine index bits live on the LANE axis;
    * column-major with sublane extent S = ``t_layout`` (shape
      (..., S, K/S)): element i at (sublane = i mod S, lane = i div S) —
      the low lg(S) index bits live on the SUBLANE axis.  Lane-level
      rolls are the expensive stages on v5e (sublane rolls at multiples
      of 8 and lane rolls at multiples of 128 are vreg renaming — free;
      sub-vreg lane rotates cost ~2.3x a sublane rotate, r4 decomp), so
      kernels transpose the tile, run the network column-major, and
      transpose back.  S=128 is the round-3 "t-layout"; bigger S moves
      stages lg(S)..lg(S)+6 off the lane axis (S=512 at K=2^16: 42 -> 28
      lane-rotate stages for the full sort).
    """
    if t_layout:
        lgs = int(t_layout).bit_length() - 1
        if bit < lgs:
            ids = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
            return (ids >> bit) & 1
        ids = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
        return (ids >> (bit - lgs)) & 1
    rows, lanes = shape[-2], shape[-1]
    if (1 << bit) >= lanes:
        ids = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
        return (ids >> (bit - lanes.bit_length() + 1)) & 1
    ids = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return (ids >> bit) & 1


def _partner(x, j: int, t_layout: int = 0):
    """Value at tile-linear index (i XOR 2^j) for every element i."""
    d = 1 << j
    if t_layout:
        s = int(t_layout)
        if d < s:
            axis, dist = x.ndim - 2, d
        else:
            axis, dist = x.ndim - 1, d // s
    else:
        lanes = x.shape[-1]
        if d >= lanes:
            axis, dist = x.ndim - 2, d // lanes
        else:
            axis, dist = x.ndim - 1, d
    size = x.shape[axis]
    fwd = pltpu.roll(x, size - dist, axis=axis)  # element i <- i + dist
    bwd = pltpu.roll(x, dist, axis=axis)         # element i <- i - dist
    return jnp.where(_bit(x.shape, j, t_layout) == 1, bwd, fwd)


def _compare_exchange(arrays, j: int, k: int, num_keys: int = 1,
                      t_layout: int = 0):
    """One bitonic stage: partner distance 2^j inside 2^(k+1)-wide runs.

    XOR-fold comparator (r4): the stage's static direction is folded into
    the comparison itself — elements whose bit j differs from bit k+1
    keep the LARGER value, and bitwise complement reverses unsigned
    order, so ``take_mine = (x^F) <= (p^F)`` with F the direction mask.
    Replaces the two per-plane direction pre-selects (and, single-key,
    the whole i32 mask dance) with XORs against a compile-time-constant
    vreg.  ``num_keys``: leading operands compared lexicographically
    (e.g. 2 for 64-bit keys as (hi, lo) planes).  On full-tie both sides
    keep their own element, so payload selects stay complementary.
    """
    shape = arrays[0].shape
    flip_bit = _bit(shape, j, t_layout) ^ _bit(shape, k + 1, t_layout)
    return _directed_exchange(arrays, j, flip_bit, num_keys, t_layout)


def _t_layout_ok(rows: int, lanes: int = LANES) -> int:
    """Best column-major sublane extent S for a (rows, lanes) tile, or 0.

    Needs a pow2 tile whose column-major shape (S, K/S) is a legal vreg
    layout (K/S a multiple of 128).  Bigger S moves more stages off the
    lane axis (stages j in [lg S, lg S + 7) are the sub-vreg lane rotates
    — the ~2.3x-priced ones); S caps at 512 because K/S must keep >= 128
    lanes at K = 2^16."""
    k = rows * lanes
    if lanes != LANES or k & (k - 1):
        return 0
    s = min(_S_CAP, k // LANES)
    if s < LANES or (k // s) % LANES:
        # s < 128 would give the _to_col intermediate (nb, K/S, S) an
        # illegal sub-128 lane dim
        return 0
    return s


# Production cap for the column-major sublane extent.  S=128's _to_col is
# a pure transpose; S>128 needs a reshape-relayout whose Mosaic scratch
# pushed every big kernel over the 16 MB scoped-vmem limit (r4 on-chip:
# pass nb=4 21.4M, leaf 22.4M).  The S=512 stage-count win (~12%) stays
# gated here until the relayout cost is solved or the scoped-vmem limit
# can be raised (--xla_tpu_scoped_vmem_limit_kib probe).
_S_CAP = 256


def _to_col(a: jax.Array, s: int) -> jax.Array:
    """Row-major (nb, rows, LANES) tile -> column-major (nb, S, K/S):
    element i moves from (i >> 7, i & 127) to (i mod S, i div S)."""
    nb = a.shape[0]
    k = a.shape[-2] * a.shape[-1]
    return jnp.swapaxes(a.reshape(nb, k // s, s), -1, -2)


def _from_col(w: jax.Array, s: int) -> jax.Array:
    """Inverse of :func:`_to_col`."""
    nb = w.shape[0]
    k = w.shape[-2] * w.shape[-1]
    return jnp.swapaxes(w, -1, -2).reshape(nb, k // LANES, LANES)


def _sort_network(arrays, num_keys: int = 1, t_layout: int = 0):
    """Full bitonic sort network over each trailing (ROWS, LANES) tile.

    Leading dims are independent tiles sorted in lockstep — batching >1 tile
    per kernel invocation overlaps the otherwise latency-bound serial stage
    chain (measured +45% on v5e).

    ``t_layout``: arrays are TRANSPOSED tiles (..., 128, ROWS) carrying the
    same linear element order (see :func:`_bit`); stages j < 7 then roll
    the cheap sublane axis.  Caller owns the transposes.
    """
    n_bits = (arrays[0].shape[-2] * arrays[0].shape[-1]).bit_length() - 1
    for k in range(n_bits):          # run width 2^(k+1)
        for j in range(k, -1, -1):   # exchange distance 2^j
            arrays = _compare_exchange(arrays, j, k, num_keys, t_layout)
    return arrays


def _merge_network(arrays):
    """Bitonic *merge* only (input must be bitonic, e.g. asc++desc halves)."""
    rows, lanes = arrays[0].shape[-2], arrays[0].shape[-1]
    n_bits = (rows * lanes).bit_length() - 1
    k = n_bits - 1
    for j in range(k, -1, -1):
        arrays = _compare_exchange(arrays, j, k)
    return arrays


def _reverse_within(x: jax.Array, run: int, t_layout: int = 0) -> jax.Array:
    """Value at index (i XOR (run-1)) — reverses every ``run``-aligned
    block.  Composes single-bit XOR partner moves (Batcher's (i, i+d)
    addition pairing cannot be expressed with lane rolls because carries
    cross the 128-lane row; XOR pairings never do)."""
    for j in range(run.bit_length() - 1):
        x = _partner(x, j, t_layout)
    return x


def _merge_sorted_runs(arrays, run_in: int, num_keys: int = 1,
                       t_layout: int = 0):
    """Sort each trailing (ROWS, LANES) tile given contiguous ``run_in``-
    element subruns already sorted ascending, by entering the standard
    bitonic sort network at phase log2(run_in).

    The network's phase-k invariant wants 2^k blocks alternately asc/desc
    (by bit k of the index), so odd runs are physically reversed first —
    a one-time XOR-decomposed reversal (~3*log2(run) ops) vs the 45+
    full-sort stages skipped.  E.g. 512-sorted runs -> 16384 tile in 60
    stages instead of 105.
    """
    shape = arrays[0].shape
    rows, lanes = shape[-2], shape[-1]
    n_bits = (rows * lanes).bit_length() - 1
    k0 = run_in.bit_length() - 1
    if run_in > 1:
        odd = _bit(shape, k0, t_layout) == 1
        arrays = [
            jnp.where(odd, _reverse_within(a, run_in, t_layout), a)
            for a in arrays
        ]
    for k in range(k0, n_bits):
        for j in range(k, -1, -1):
            arrays = _compare_exchange(arrays, j, k, num_keys, t_layout)
    return arrays


def merge_staged_factor(k_real: int) -> int:
    """The odd block factor f for which the staged f*2^a merge applies
    (f in {3, 5}), or 0."""
    for f in (3, 5):
        blk = k_real // f
        if f * blk == k_real and blk >= LANES and (blk & (blk - 1)) == 0:
            return f
    return 0


def _merge_sorted_runs_fpow2(arrays, run_in: int, num_keys: int = 1,
                             t_layout: int = 0):
    """Sort tiles of K = f*2^a elements (f in {3,5}; sorted ``run_in``
    subruns) without paying the full pow2-padding up front.

    ``arrays`` are ROW-MAJOR (nb, rows, LANES) tiles; ``t_layout`` (an
    int S, or 0) selects the per-block column-major stage layout —
    blocks are sliced row-major and converted individually.  Phase
    structure: per-block phases up to 2^a (block direction = parity),
    block-pair merges re-establishing ascending runs, then a cascade
    that inserts the odd back block into the sorted front.
    """
    shape = arrays[0].shape
    k_total = shape[-2] * shape[-1]
    rows = k_total // LANES
    f = merge_staged_factor(k_total)
    blk = k_total // f
    a = blk.bit_length() - 1
    brows = blk // LANES            # block extent in row-major rows
    nb = shape[0]
    k0 = run_in.bit_length() - 1
    n_arr = len(arrays)
    s_col = int(t_layout) if t_layout else 0
    # within col-major groups, a block spans blk // s_col lanes
    blk_axis = len(shape) - 1 if s_col else len(shape) - 2
    gunit = (blk // s_col) if s_col else brows

    def _blk_slice(x, lo, hi):
        if s_col:
            return x[:, :, lo:hi]
        return x[:, lo:hi]

    def _col(x):
        return _to_col(x, s_col) if s_col else x

    def _row(x):
        return _from_col(x, s_col) if s_col else x

    # Every phase below operates on ONE block or one 2-block group at a
    # time, sliced ROW-MAJOR from the input and converted to the
    # column-major stage layout per block — the live VMEM set is bounded
    # by ~2 blocks of temporaries regardless of f and operand count.
    # (A whole-tile formulation materializes 10+ full-tile temporaries;
    # at the 2^28 leaf geometry — 5*2^16-element tiles — that blows the
    # 16 MB scoped-vmem limit, single-operand included once the
    # whole-tile layout conversions are added.)  Block-locality is
    # exact: stages of phases k < a only reference index bits < a, and
    # the one global bit each later phase consults (the run-direction
    # bit) is CONSTANT within a block or 2-block group, folded into the
    # directed comparator's flip.

    # per-block: entry reversal + phases k0..a-1 (bit a = block parity)
    blocks = []
    for b in range(f):
        lo = b * brows
        ops_b = [_col(x[:, lo : lo + brows]) for x in arrays]
        if run_in > 1:
            if k0 < a:
                odd = _bit(ops_b[0].shape, k0, s_col) == 1
                ops_b = [
                    jnp.where(odd, _reverse_within(x, run_in, s_col), x)
                    for x in ops_b
                ]
            elif b & 1:
                ops_b = [_reverse_within(x, run_in, s_col)
                         for x in ops_b]
        for k in range(k0, a - 1):
            for j in range(k, -1, -1):
                ops_b = _compare_exchange(ops_b, j, k, num_keys, s_col)
        if k0 <= a - 1:
            ops_b = _run_phase(ops_b, a - 1, b & 1, num_keys, s_col)
        blocks.append(ops_b)

    # phase a: merge block pairs (0,1) [and (2,3)] — pair p's direction
    # is global bit a+1 = p
    pairs = []
    for p in range((f - 1) // 2):
        g = [
            jnp.concatenate([blocks[2 * p][i], blocks[2 * p + 1][i]],
                            axis=blk_axis)
            for i in range(n_arr)
        ]
        pairs.append(_run_phase(g, a, p & 1, num_keys, s_col))

    if f == 5:
        # phase a+1 over the front four blocks, decomposed: the j=a+1
        # stage pairs element i of group (0,1) with element i of group
        # (2,3) — a direct elementwise exchange, no rolls — then stages
        # j=a..0 run within each (now ascending) half
        lo_g, hi_g = pairs
        take = None
        take_i32 = None
        for i in reversed(range(num_keys)):
            u, v = lo_g[i], hi_g[i]
            if num_keys == 1:
                take = u <= v
            elif take_i32 is None:
                take_i32 = jnp.where(u <= v, jnp.int32(1), jnp.int32(0))
            else:
                lt = jnp.where(u < v, jnp.int32(1), jnp.int32(0))
                take_i32 = jnp.where(u == v, take_i32, lt)
        if take is None:
            take = take_i32 == 1
        new_lo = [jnp.where(take, x, y) for x, y in zip(lo_g, hi_g)]
        new_hi = [jnp.where(take, y, x) for x, y in zip(lo_g, hi_g)]
        pairs = [
            _run_phase(new_lo, a, 0, num_keys, s_col),
            _run_phase(new_hi, a, 0, num_keys, s_col),
        ]

    front = []
    for g in pairs:
        front.append([_blk_slice(x, 0, gunit) for x in g])
        front.append([_blk_slice(x, gunit, 2 * gunit) for x in g])
    back = blocks[f - 1]

    # cascade back-insertion (r4): merge the back block INTO the sorted
    # front top-down: front blocks F_0 <= ... <= F_{f-2} (one sorted
    # run), so bitonic-merging [F_i asc | work desc] emits its high block
    # as final output and hands the low block down.  Each step's low half
    # is sorted DESCENDING in place (statically flipped directions), so
    # no per-step reversal is needed — one reversal at entry and one for
    # the lowest block.
    work = [_reverse_within(x, blk, s_col) for x in back]  # descending
    pieces = [None] * f
    for bi in reversed(range(f - 1)):
        pair = [
            jnp.concatenate([fr, w], axis=blk_axis)
            for fr, w in zip(front[bi], work)
        ]
        pair = _bitonic_split_merge(pair, a, num_keys, s_col)
        pieces[bi + 1] = [_blk_slice(x, gunit, 2 * gunit) for x in pair]
        work = [_blk_slice(x, 0, gunit) for x in pair]
    pieces[0] = [_reverse_within(w, blk, s_col) for w in work]
    return [
        jnp.concatenate([_row(pieces[b][i]) for b in range(f)], axis=-2)
        for i in range(n_arr)
    ]


def _run_phase(ops, k_hi: int, const_flip: int, num_keys: int,
               t_layout: int) -> list:
    """Stages j = k_hi..0 with direction flip = (local bit j) XOR
    ``const_flip`` — one bitonic-merge phase whose run-direction bit is
    constant over this (block-local) array."""
    shape = ops[0].shape
    for j in range(k_hi, -1, -1):
        flip = _bit(shape, j, t_layout) ^ const_flip
        ops = _directed_exchange(ops, j, flip, num_keys, t_layout)
    return ops


def _bitonic_split_merge(arrays, a: int, num_keys: int, t_layout: int):
    """Directed merge of a 2-block bitonic input [asc | desc] (block =
    2^a elements): the high half comes out sorted ASCENDING, the low half
    DESCENDING — the cascade's hand-me-down needs no reversal.  The split
    stage keeps min/max by bit a; the per-half phases flip comparator
    direction via the same XOR-fold the main comparator uses."""
    shape = arrays[0].shape
    ba = _bit(shape, a, t_layout)
    arrays = _directed_exchange(arrays, a, ba, num_keys, t_layout)
    for j in range(a - 1, -1, -1):
        bj = _bit(shape, j, t_layout)
        # high half (bit a = 1) ascending: flip where bit j = 1;
        # low half descending: flip where bit j = 0
        arrays = _directed_exchange(arrays, j, bj ^ ba ^ 1, num_keys,
                                    t_layout)
    return arrays


def _directed_exchange(arrays, j: int, flip_bit, num_keys: int,
                       t_layout: int):
    """Compare-exchange at distance 2^j with an explicit direction field:
    element i keeps the SMALLER value iff flip_bit[i] == 0 (XOR-fold, see
    ``_XOR_COMPARATOR``)."""
    partners = [_partner(a, j, t_layout) for a in arrays]
    flip = jnp.uint32(0) - flip_bit.astype(jnp.uint32)
    take_mine = None
    take_i32 = None
    for i in reversed(range(num_keys)):
        u = arrays[i] ^ flip
        v = partners[i] ^ flip
        if num_keys == 1:
            take_mine = u <= v
        elif take_i32 is None:
            take_i32 = jnp.where(u <= v, jnp.int32(1), jnp.int32(0))
        else:
            lt = jnp.where(u < v, jnp.int32(1), jnp.int32(0))
            take_i32 = jnp.where(u == v, take_i32, lt)
    if take_mine is None:
        take_mine = take_i32 == 1
    return [jnp.where(take_mine, a, pa) for a, pa in zip(arrays, partners)]


# backward-compatible name
_merge_sorted_runs_3pow2 = _merge_sorted_runs_fpow2


def _leaf_network(arrays, *, pad_rows: int, sorted_run: int, num_keys: int):
    """Shared leaf network driver: staged f*2^a merge when the tile factors
    as f*2^a with matching sorted runs, else the (virtually padded) bitonic
    sort/merge — in the transposed stage layout whenever the transpose is a
    legal vreg shape (fine index bits on the cheap sublane axis; see
    :func:`_bit`).  ``arrays`` are (nb, rows, LANES); keys already carry
    the 0xFFFFFFFF garbage sentinel.  Returns (nb, rows, LANES) sorted."""
    nb, rows, _ = arrays[0].shape
    k_real = rows * LANES
    f = merge_staged_factor(k_real)
    staged = bool(
        pad_rows and sorted_run and f and (k_real // f) % sorted_run == 0
    )
    if staged:
        # the staged merge slices row-major blocks and converts each to
        # column-major internally (per-block S — whole-tile conversions
        # blew the scoped-vmem limit at the 2^28 leaf geometry); S only
        # needs the BLOCK's lane extent (blk/S) on 128-lane boundaries
        blk = k_real // f
        t_lay = 0
        s = min(_S_CAP, blk // LANES)
        if s >= LANES and blk % s == 0 and (blk // s) % LANES == 0:
            t_lay = s
        return _merge_sorted_runs_fpow2(arrays, sorted_run, num_keys,
                                        t_lay)
    if pad_rows:
        padded = []
        for i, x in enumerate(arrays):
            if i < num_keys:
                pad = jnp.full((nb, pad_rows, LANES), 0xFFFFFFFF,
                               jnp.uint32)
            else:
                pad = jnp.zeros((nb, pad_rows, LANES), x.dtype)
            padded.append(jnp.concatenate([x, pad], axis=1))
        arrays = padded
    p_rows = arrays[0].shape[1]
    t_lay = _t_layout_ok(p_rows)
    if t_lay:
        arrays = [_to_col(x, t_lay) for x in arrays]
    if sorted_run:
        arrays = _merge_sorted_runs(arrays, sorted_run, num_keys, t_lay)
    else:
        arrays = _sort_network(arrays, num_keys, t_lay)
    if t_lay:
        arrays = [_from_col(x, t_lay) for x in arrays]
    return [x[:, :rows] for x in arrays]


def _sort_kernel(*refs, n_ops: int, pad_rows: int):
    ins, outs = refs[:n_ops], refs[n_ops:]
    arrays = [r[...] for r in ins]  # (NB, ROWS, LANES)
    # virtual padding to the next power of two: pad sortkeys are the max
    # uint32, so they sort past every real element and are never written
    # back (only the first ROWS rows are stored)
    arrays = _leaf_network(arrays, pad_rows=pad_rows, sorted_run=0,
                           num_keys=1)
    for o, a in zip(outs, arrays):
        o[...] = a


def _masked_sort_kernel(*refs, n_ops: int, pad_rows: int,
                        sorted_run: int = 0, num_keys: int = 1):
    """Raw-key leaf sort: garbage slots (mask == 0) are rewritten to
    0xFFFFFFFF and the raw keys sorted, any payload operands riding along.
    Multiset-exact for keys-only; for pairs the caller pre-checks that no
    valid key equals 0xFFFFFFFF (unstable-pairs semantics).
    ``sorted_run``: input already has sorted subruns of that pow2 length
    (merge network, incl. virtual 0xFFFFFFFF pad runs)."""
    ins = refs[:n_ops]
    mask_ref = refs[n_ops]
    outs = refs[n_ops + 1:]
    arrays = [r[...] for r in ins]
    valid = mask_ref[...] != 0
    for i in range(num_keys):
        arrays[i] = jnp.where(valid, arrays[i], jnp.uint32(0xFFFFFFFF))
    arrays = _leaf_network(arrays, pad_rows=pad_rows,
                           sorted_run=sorted_run, num_keys=num_keys)
    for o, a in zip(outs, arrays):
        o[...] = a


def _counts_sort_kernel(*refs, n_ops: int, q: int,
                        pad_rows: int, sorted_run: int, num_keys: int):
    """Raw-key leaf sort with validity from a per-tile SMEM counts table
    (subrun i of q elements holds counts[b, 0, i] valid as a prefix):
    garbage slots are rewritten to 0xFFFFFFFF on the key operands."""
    ins = refs[:n_ops]
    cref = refs[n_ops]
    outs = refs[n_ops + 1:]
    arrays = [r[...] for r in ins]
    nb, rows, _ = arrays[0].shape
    valid = _valid_from(cref, q, nb, rows, rows * LANES, None)
    for i in range(num_keys):
        arrays[i] = jnp.where(valid, arrays[i], jnp.uint32(0xFFFFFFFF))

    arrays = _leaf_network(arrays, pad_rows=pad_rows,
                           sorted_run=sorted_run, num_keys=num_keys)
    for o, a in zip(outs, arrays):
        o[...] = a


def sort_tiles_counts(
    op,
    counts: jax.Array,
    q: int,
    *,
    sorted_run: int = 0,
    num_keys: int = 1,
    batch: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Like :func:`sort_tiles_masked` but validity comes from a tiny
    (T, K//q) int32 counts table instead of a per-element mask — the leaf
    side of the counts-chain design (no validity bytes in HBM)."""
    single = not isinstance(op, (list, tuple))
    ops = [jnp.asarray(op)] if single else [jnp.asarray(o) for o in op]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, K = ops[0].shape
    if K % LANES or q % LANES or K % q:
        raise ValueError(f"bad tile geometry K={K} q={q}")
    rows = K // LANES
    n_sub = K // q
    k_pow2 = 1 << (K - 1).bit_length()
    pad_rows = k_pow2 // LANES - rows
    n_ops = len(ops)
    nb = _pick_batch(T, K, n_ops, batch)

    if sorted_run and (K % sorted_run or pad_rows * LANES % sorted_run):
        sorted_run = 0
    spec = pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_counts_sort_kernel, n_ops=n_ops,
                          q=q, pad_rows=pad_rows, sorted_run=sorted_run,
                          num_keys=num_keys),
        out_shape=[jax.ShapeDtypeStruct((T, rows, LANES), o.dtype)
                   for o in ops],
        grid=(T // nb,),
        in_specs=[spec] * n_ops + [
            pl.BlockSpec((nb, 1, n_sub), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM)
        ],
        out_specs=[spec] * n_ops,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*[o.reshape(T, rows, LANES) for o in ops],
      counts.astype(jnp.int32).reshape(T, 1, n_sub))
    out = [o.reshape(T, K) for o in out]
    return out[0] if single else out


def _counts_sort_collapse_kernel(
    *refs, n_ops: int, q: int, pad_rows: int,
    sorted_run: int, num_keys: int, nb: int, rows: int, defer: bool,
):
    """Fused raw-key leaf sort + dense collapse: after sorting (garbage to
    the tile tail), each tile's valid prefix is streamed directly to its
    dense global offset via the collapse write discipline.

    r4 write pipeline: the stream buffer is double-buffered and the
    output DMA's wait is DEFERRED to just before the NEXT step's start,
    so the write overlaps the next tile's whole sort network.  The
    boundary row (the partial last row the previous step placed) is
    relayed through VMEM — buffer parity alternates every step and the
    previous step's row offset delta comes from the table — replacing
    the per-step HBM readback DMA.  Overlapping-row ordering between
    consecutive output DMAs is guaranteed by that same deferred wait."""
    from tpusort.kernels.collapse import _place

    ins = refs[:n_ops]
    cref = refs[n_ops]
    tbl_ref = refs[n_ops + 1]
    outs = refs[n_ops + 2 : n_ops + 2 + n_ops]
    bufs = refs[n_ops + 2 + n_ops : n_ops + 2 + 2 * n_ops]
    sem = refs[n_ops + 2 + 2 * n_ops]

    arrays = [r[...] for r in ins]
    valid = _valid_from(cref, q, nb, rows, rows * LANES, None)
    for i in range(num_keys):
        arrays[i] = jnp.where(valid, arrays[i], jnp.uint32(0xFFFFFFFF))

    arrays = _leaf_network(arrays, pad_rows=pad_rows,
                           sorted_run=sorted_run, num_keys=num_keys)

    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    row0 = tbl_ref[0, 0, 0]
    p = tbl_ref[0, 0, 1]
    delta = tbl_ref[0, 0, 2 + nb]          # row0 - previous step's row0
    brows = nb * rows + 2
    if defer:
        cur = (jnp.int32(step) % jnp.int32(2)) * brows
        prev = (jnp.int32(1) - jnp.int32(step) % jnp.int32(2)) * brows
    else:
        # big stream buffers skip the double-buffered deferred wait (the
        # extra brows of scratch is what pushed the 2^28 leaf over the
        # scoped-vmem limit); the VMEM boundary relay still applies —
        # read the previous stream's boundary row before overwriting.
        # Static python-int offsets keep the stores on the common
        # lowering path.
        cur = 0
        prev = 0

    # boundary row via VMEM relay from the previous step's buffer (its
    # content before the cursor is exactly what the HBM row holds)
    for i in range(n_ops):
        bufs[i][pl.ds(cur, 1), :] = bufs[i][pl.ds(prev + delta, 1), :]
    for i in range(n_ops):
        cursor = p
        for b in range(nb):
            _place(bufs[i], arrays[i][b, :rows], cursor, base=cur)
            cursor = cursor + tbl_ref[0, 0, 2 + b]

    def _copy(i):
        return pltpu.make_async_copy(
            bufs[i].at[pl.ds(cur, brows - 1), :],
            outs[i].at[pl.ds(row0, brows - 1), :],
            sem,
        )

    if defer:
        @pl.when(step > 0)
        def _wait_prev():
            # previous step's copy: same byte count, so a same-shape
            # descriptor waits it regardless of its (different) offsets
            for i in range(n_ops):
                _copy(i).wait()

        for i in range(n_ops):
            _copy(i).start()

        @pl.when(step == nsteps - 1)
        def _final_wait():
            for i in range(n_ops):
                _copy(i).wait()
    else:
        for i in range(n_ops):
            cp = _copy(i)
            cp.start()
            cp.wait()


def sort_tiles_counts_collapsed(
    op,
    counts: jax.Array,
    q: int,
    n_out: int,
    *,
    sorted_run: int = 0,
    num_keys: int = 1,
    batch: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Fused :func:`sort_tiles_counts` + ``collapse_segments``: returns the
    DENSE (n_out,) sorted arrays directly, skipping the separate
    whole-array compaction pass (its HBM read+write and kernel overhead).
    Per-tile dense offsets are the exclusive cumsum of the counts-table
    row sums — known before the kernel runs (the counts chain)."""
    single = not isinstance(op, (list, tuple))
    ops = [jnp.asarray(op)] if single else [jnp.asarray(o) for o in op]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, K = ops[0].shape
    if K % LANES or q % LANES or K % q:
        raise ValueError(f"bad tile geometry K={K} q={q}")
    rows = K // LANES
    n_sub = K // q
    k_pow2 = 1 << (K - 1).bit_length()
    pad_rows = k_pow2 // LANES - rows
    n_ops = len(ops)
    nb = _pick_batch(T, K, n_ops, batch)
    if sorted_run and (K % sorted_run or pad_rows * LANES % sorted_run):
        sorted_run = 0

    counts = counts.astype(jnp.int32)
    tile_counts = counts.sum(axis=1)                       # (T,)
    offsets = jnp.cumsum(tile_counts) - tile_counts
    nsteps = T // nb
    brows = nb * rows + 2
    if nb + 3 > LANES:
        raise ValueError("batch too large for the offset table row")
    g_off = offsets[::nb]
    rows0 = g_off >> 7
    tbl = jnp.zeros((nsteps, LANES), jnp.int32)
    tbl = tbl.at[:, 0].set(rows0)
    tbl = tbl.at[:, 1].set(g_off & 127)
    tbl = tbl.at[:, 2 : 2 + nb].set(tile_counts.reshape(nsteps, nb))
    # boundary-relay delta: this step's output row minus the previous
    # step's (step 0: unused, lane offset there is 0)
    tbl = tbl.at[:, 2 + nb].set(
        rows0 - jnp.concatenate([rows0[:1], rows0[:-1]])
    )
    total_rows = -(-n_out // LANES) + brows

    spec = pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    defer = 2 * brows * LANES * 4 * n_ops <= _DEFER_STREAM_LIMIT
    out = pl.pallas_call(
        functools.partial(
            _counts_sort_collapse_kernel, n_ops=n_ops, q=q,
            pad_rows=pad_rows, sorted_run=sorted_run, num_keys=num_keys,
            nb=nb, rows=rows, defer=defer,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((total_rows, LANES), o.dtype) for o in ops
        ],
        grid=(nsteps,),
        in_specs=[spec] * n_ops + [
            pl.BlockSpec((nb, 1, n_sub), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_ops)],
        scratch_shapes=[pltpu.VMEM(((2 if defer else 1) * brows, LANES),
                                   jnp.uint32)
                        for _ in range(n_ops)]
        + [pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*[o.reshape(T, rows, LANES) for o in ops],
      counts.reshape(T, 1, n_sub), tbl[:, None, :])
    out = [o.reshape(-1)[:n_out] for o in out]
    return out[0] if single else out


def sort_tiles_masked(
    op,
    mask: jax.Array,
    *,
    sorted_run: int = 0,
    num_keys: int = 1,
    batch: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Sort each row-tile ascending by the raw key, treating slots with
    mask == 0 as garbage (they come out as 0xFFFFFFFF at the tile tail,
    after every valid element or tied with equal valid keys).

    ``op`` may be a single (T, K) uint32 array (returns one array) or a
    list [keys, payload...] (returns the list, payloads permuted with the
    keys — unstable on ties, reference rdxsrt_unstable_sort semantics)."""
    single = not isinstance(op, (list, tuple))
    ops = [jnp.asarray(op)] if single else [jnp.asarray(o) for o in op]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, K = ops[0].shape
    if K % LANES:
        raise ValueError(f"tile size {K} must be a multiple of {LANES}")
    rows = K // LANES
    k_pow2 = 1 << (K - 1).bit_length()
    pad_rows = k_pow2 // LANES - rows
    n_ops = len(ops)
    nb = _pick_batch(T, K, n_ops, batch)

    if sorted_run and (K % sorted_run or pad_rows * LANES % sorted_run):
        sorted_run = 0
    spec = pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_masked_sort_kernel, n_ops=n_ops,
                          pad_rows=pad_rows, sorted_run=sorted_run,
                          num_keys=num_keys),
        out_shape=[jax.ShapeDtypeStruct((T, rows, LANES), o.dtype)
                   for o in ops],
        grid=(T // nb,),
        in_specs=[spec] * (n_ops + 1),
        out_specs=[spec] * n_ops,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*[o.reshape(T, rows, LANES) for o in ops],
      mask.reshape(T, rows, LANES))
    out = [o.reshape(T, K) for o in out]
    return out[0] if single else out


def _pick_batch(t: int, k: int, n_ops: int, batch: Optional[int]) -> int:
    """Tiles per grid step: enough ILP to cover the serial stage chain,
    bounded by VMEM (in + out + ~4 live temporaries per operand)."""
    if batch is not None:
        nb = batch
    else:
        budget = 8 << 20  # bytes of VMEM for operand blocks
        per_tile = k * 4 * n_ops * 6
        nb = max(1, min(8, budget // per_tile))
        nb = 1 << (nb.bit_length() - 1)   # pow2 so T divisibility holds
    while t % nb:
        nb //= 2
    return max(nb, 1)


def sort_tiles(
    operands: Sequence[jax.Array],
    *,
    batch: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, ...]:
    """Sort each row-tile of the given operands by the first operand.

    Every operand has shape (T, K) with K a multiple of 128; tiles (rows of
    the matrix) are sorted independently, ascending by operand 0 (uint32).
    Non-power-of-two K is virtually padded to the next power of two inside
    the kernel (pad sortkeys = max uint32, sorting past all real elements —
    callers using 0xFFFFFFFF as a garbage sentinel get them mixed, which is
    the intended semantics).  Returns the sorted operands.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ops = [jnp.asarray(o) for o in operands]
    T, K = ops[0].shape
    if K % LANES:
        raise ValueError(f"tile size {K} must be a multiple of {LANES}")
    rows = K // LANES
    k_pow2 = 1 << (K - 1).bit_length()
    pad_rows = k_pow2 // LANES - rows
    n = len(ops)
    nb = _pick_batch(T, K, n, batch)
    shaped = [o.reshape(T, rows, LANES) for o in ops]

    out = pl.pallas_call(
        functools.partial(_sort_kernel, n_ops=n, pad_rows=pad_rows),
        out_shape=[jax.ShapeDtypeStruct((T, rows, LANES), o.dtype) for o in ops],
        grid=(T // nb,),
        in_specs=[
            pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in ops
        ],
        out_specs=[
            pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in ops
        ],
        interpret=interpret,
    )(*shaped)
    return tuple(o.reshape(T, K) for o in out)
