"""Pallas TPU collapse kernel: drop padded-segment garbage tails.

The final step of the MSD engine: the leaf pass leaves (nseg, seg) segments
whose first counts[s] elements are valid; this kernel concatenates the valid
prefixes in order into a dense array — the analog of the reference's final
output materialization (finished buckets written to the output buffer,
``msb/src/sort/gpu_radix_sort.h:359-360``).

TPU realization of an order-preserving compaction (there is no scatter):
the grid walks segment GROUPS in output order (TPU grids execute
sequentially on-core), each step

  1. DMA-reads back the single output row its stream starts in (the
     previous step's tail — re-reading the written output is robust even
     when a tail spans many tiny segments),
  2. concatenates its G segments' valid prefixes into a VMEM stream buffer
     with dynamic lane rotates + boundary-row selects,
  3. DMA-writes the stream to the output at its (dynamic) row offset,
     overshooting into the next group's territory; the next step overwrites
     the overshoot.  Adjacent steps' DMAs are ordered by the in-step wait.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusort.kernels.bitonic import LANES, _DEFER_STREAM_LIMIT, _VMEM_LIMIT


def _place(b_ref, src: jax.Array, cursor, base=0) -> None:
    """Write src (rows, 128) into stream buffer b_ref at element offset
    ``cursor`` (+ ``base`` whole rows — the double-buffer half offset),
    preserving b_ref content before the cursor."""
    rows = src.shape[0]
    r0 = base + (cursor >> 7)
    l0 = cursor & 127
    # rot[i, j] = src[i, (j - l0) mod 128]
    rot = pltpu.roll(src, l0, axis=1)
    existing = b_ref[pl.ds(r0, 1), :]
    # output row i: lanes >= l0 come from rot[i] (rot[rows-1] garbage-extended
    # for the final row), lanes < l0 from rot[i-1] (existing B row for i=0)
    hi = jnp.concatenate([rot, rot[-1:]], axis=0)          # (rows+1, 128)
    lo = jnp.concatenate([existing, rot], axis=0)          # (rows+1, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows + 1, LANES), 1)
    b_ref[pl.ds(r0, rows + 1), :] = jnp.where(lane >= l0, hi, lo)


def _collapse_kernel(
    tbl_ref, *refs, n_data: int, g: int, segrows: int, defer: bool
):
    # refs = [data_in x n_data (1, g*segrows, 128)] + [out x n_data (ANY)]
    #        + scratch: [B x n_data (double-buffered), sem]
    #
    # r4 write pipeline (see bitonic._counts_sort_collapse_kernel): the
    # output DMA's wait is deferred to just before the next step's start,
    # and the boundary row is relayed through the previous step's (still
    # readable) stream buffer instead of an HBM readback.
    ins = refs[:n_data]
    outs = refs[n_data : 2 * n_data]
    bufs = refs[2 * n_data : 3 * n_data]
    sem = refs[3 * n_data]

    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    row0 = tbl_ref[0, 0, 0]
    p = tbl_ref[0, 0, 1]
    delta = tbl_ref[0, 0, 2 + g]
    brows = g * segrows + 2
    if defer:
        cur = (jnp.int32(step) % jnp.int32(2)) * brows
        prev = (jnp.int32(1) - jnp.int32(step) % jnp.int32(2)) * brows
    else:
        # static python-int offsets: common store-lowering path
        cur = 0
        prev = 0

    # 1. boundary row via VMEM relay from the previous step's buffer
    for i in range(n_data):
        bufs[i][pl.ds(cur, 1), :] = bufs[i][pl.ds(prev + delta, 1), :]

    # 2. concatenate valid prefixes
    for i in range(n_data):
        cursor = p
        for s in range(g):
            c_s = tbl_ref[0, 0, 2 + s]
            src = ins[i][0, s * segrows : (s + 1) * segrows]
            _place(bufs[i], src, cursor, base=cur)
            cursor = cursor + c_s

    # 3. write the stream (overshoot garbage is overwritten by the next
    # step's copy, ordered by the deferred wait below)
    def _copy(i):
        return pltpu.make_async_copy(
            bufs[i].at[pl.ds(cur, brows - 1), :],
            outs[i].at[pl.ds(row0, brows - 1), :],
            sem,
        )

    if defer:
        @pl.when(step > 0)
        def _wait_prev():
            for i in range(n_data):
                _copy(i).wait()      # same byte count as the prior copy

        for i in range(n_data):
            _copy(i).start()

        @pl.when(step == nsteps - 1)
        def _final_wait():
            for i in range(n_data):
                _copy(i).wait()
    else:
        for i in range(n_data):
            cp = _copy(i)
            cp.start()
            cp.wait()


# VMEM budget per operand for the stream buffer + input block (bytes).
# Above it, big segments are streamed through fixed-size chunks instead of
# sizing the scratch to group*segrows (the r3 distributed-finish OOM:
# s32[353928,128] = 181 MB of scratch at a 5.66M-element shard capacity).
_VMEM_BUDGET = 4 << 20


def collapse_segments(
    ops: Sequence[jax.Array],
    seg_counts: jax.Array,
    n_out: int,
    *,
    group: int = 8,
    interpret: Optional[bool] = None,
) -> List[jax.Array]:
    """Concatenate per-segment valid prefixes into dense (n_out,) arrays.

    ops: (nseg, seg) uint32 arrays (seg multiple of 128); seg_counts:
    (nseg,) int32 valid prefix lengths, sum >= n_out.

    VMEM-bounded in both directions: small segments are grouped (several
    segments per grid step), large segments are CHUNKED — each step streams
    a fixed-size window of one segment to its dense offset.  A chunk's
    write offset and data offset both derive from the same clamped row
    offset, so the overlapping tail chunk rewrites identical values, and
    garbage beyond a segment's valid prefix always lands in positions
    owned by later grid steps (sequential on-core), which overwrite it.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ops = [jnp.asarray(o) for o in ops]
    nseg, seg = ops[0].shape
    if seg % LANES:
        raise ValueError("segment size must be a multiple of 128")
    segrows = seg // LANES
    budget_rows = max(8, _VMEM_BUDGET // (LANES * 4))
    n_data = len(ops)

    offsets = jnp.cumsum(seg_counts) - seg_counts              # (nseg,)

    if segrows > budget_rows:
        # chunked mode: grid over (segment, chunk); clamped overlap on the
        # ragged tail keeps every block spec static
        f = budget_rows
        nch = -(-segrows // f)
        s_idx = jnp.repeat(jnp.arange(nseg, dtype=jnp.int32), nch)
        c_idx = jnp.tile(jnp.arange(nch, dtype=jnp.int32), nseg)
        coff = jnp.minimum(c_idx * f, segrows - f)              # rows
        cursor = offsets[s_idx] + coff * LANES
        cnt = jnp.clip(
            seg_counts[s_idx].astype(jnp.int32) - coff * LANES, 0, f * LANES
        )
        nsteps = nseg * nch
        tbl = jnp.zeros((nsteps, LANES), jnp.int32)
        tbl = tbl.at[:, 0].set(cursor >> 7)
        tbl = tbl.at[:, 1].set(cursor & 127)
        tbl = tbl.at[:, 2].set(cnt)
        # source row of each chunk in the flat (nseg*segrows,) row space;
        # the clamped tail offset is generally not a multiple of f, so the
        # input stays in ANY memory and the window is DMA'd in-kernel
        tbl = tbl.at[:, 3].set(s_idx * segrows + coff)
        brows = f + 2
        total_rows = -(-n_out // LANES) + brows
        flat = [o.reshape(nseg * segrows, LANES) for o in ops]
        out = pl.pallas_call(
            functools.partial(
                _collapse_chunk_kernel, n_data=n_data, f=f,
                segrows=segrows, rows_limit=-(-n_out // LANES),
            ),
            out_shape=[
                jax.ShapeDtypeStruct((total_rows, LANES), jnp.uint32)
                for _ in range(n_data)
            ],
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, 1, LANES), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_data)],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_data)
            ],
            scratch_shapes=[pltpu.VMEM((brows, LANES), jnp.uint32)
                            for _ in range(n_data)]
            + [pltpu.VMEM((f, LANES), jnp.uint32) for _ in range(n_data)]
            + [pltpu.VMEM((1, LANES), jnp.uint32) for _ in range(n_data)]
            + [pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(tbl[:, None, :], *flat)
        return [o.reshape(-1)[:n_out] for o in out]

    while nseg % group:
        group //= 2
    while group > 1 and group * segrows > budget_rows:
        group //= 2
    nsteps = nseg // group
    brows = group * segrows + 2

    g_off = offsets[:: group]                                   # (nsteps,)
    rows0 = g_off >> 7
    tbl = jnp.zeros((nsteps, LANES), jnp.int32)
    tbl = tbl.at[:, 0].set(rows0)
    tbl = tbl.at[:, 1].set(g_off & 127)
    counts_g = seg_counts.reshape(nsteps, group)
    tbl = tbl.at[:, 2 : 2 + group].set(counts_g.astype(jnp.int32))
    if group + 3 > LANES:
        raise ValueError("group too large for the offset table row")
    tbl = tbl.at[:, 2 + group].set(
        rows0 - jnp.concatenate([rows0[:1], rows0[:-1]])
    )

    total_rows = nseg * segrows + brows
    shaped = [o.reshape(nsteps, group * segrows, LANES) for o in ops]

    defer = 2 * brows * LANES * 4 * n_data <= _DEFER_STREAM_LIMIT
    out = pl.pallas_call(
        functools.partial(
            _collapse_kernel, n_data=n_data, g=group, segrows=segrows,
            defer=defer,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((total_rows, LANES), jnp.uint32)
            for _ in range(n_data)
        ],
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, 1, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((1, group * segrows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_data)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_data)
        ],
        scratch_shapes=[pltpu.VMEM(((2 if defer else 1) * brows, LANES),
                                   jnp.uint32)
                        for _ in range(n_data)]
        + [pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(tbl[:, None, :], *shaped)
    return [o.reshape(-1)[:n_out] for o in out]


def _collapse_chunk_kernel(
    tbl_ref, *refs, n_data: int, f: int, segrows: int, rows_limit: int
):
    """Chunked collapse step: stream one f-row window of one segment to its
    dense output offset.  Input arrays live in ANY memory (the clamped
    chunk row offset is not block-aligned); the window is DMA'd in.

    tbl row: [row0, lane0, count, src_row, 0...].  count == 0 steps skip
    their output write entirely (fully-invalid tail chunks), as do steps
    whose output row exceeds ``rows_limit`` (the documented contract
    allows sum(seg_counts) > n_out — data past n_out is droppable, and
    writing it would overrun the ceil(n_out/128)-row output)."""
    ins = refs[:n_data]
    outs = refs[n_data : 2 * n_data]
    bufs = refs[2 * n_data : 3 * n_data]
    winbufs = refs[3 * n_data : 4 * n_data]
    rowbufs = refs[4 * n_data : 5 * n_data]
    sem = refs[5 * n_data]

    row0 = tbl_ref[0, 0, 0]
    p = tbl_ref[0, 0, 1]
    cnt = tbl_ref[0, 0, 2]
    src_row = tbl_ref[0, 0, 3]
    brows = f + 2

    @pl.when((cnt > 0) & (row0 <= rows_limit))
    def _do():
        for i in range(n_data):
            cp_win = pltpu.make_async_copy(
                ins[i].at[pl.ds(src_row, f), :], winbufs[i], sem
            )
            cp_win.start()
            cp_win.wait()
        for i in range(n_data):
            cp_in = pltpu.make_async_copy(
                outs[i].at[pl.ds(row0, 1), :], rowbufs[i], sem
            )
            cp_in.start()
            cp_in.wait()
            bufs[i][pl.ds(0, 1), :] = rowbufs[i][...]
        for i in range(n_data):
            _place(bufs[i], winbufs[i][...], p)
        for i in range(n_data):
            cp_out = pltpu.make_async_copy(
                bufs[i].at[pl.ds(0, brows - 1), :],
                outs[i].at[pl.ds(row0, brows - 1), :],
                sem,
            )
            cp_out.start()
            cp_out.wait()
