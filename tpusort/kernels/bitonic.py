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


def _bit(shape, bit: int):
    """Int32 (ROWS, LANES) array: linear-index bit ``bit`` (0 or 1)."""
    rows, lanes = shape
    if (1 << bit) >= lanes:
        ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0)  # row ids
        return (ids >> (bit - lanes.bit_length() + 1)) & 1
    ids = jax.lax.broadcasted_iota(jnp.int32, shape, 1)  # lane ids
    return (ids >> bit) & 1


def _partner(x, j: int):
    """Value at linear index (i XOR 2^j) for every element i."""
    rows, lanes = x.shape
    d = 1 << j
    if d >= lanes:
        axis, dist = 0, d // lanes
    else:
        axis, dist = 1, d
    size = x.shape[axis]
    fwd = pltpu.roll(x, size - dist, axis=axis)  # element i <- i + dist
    bwd = pltpu.roll(x, dist, axis=axis)         # element i <- i - dist
    return jnp.where(_bit(x.shape, j) == 1, bwd, fwd)


def _compare_exchange(arrays, j: int, k: int):
    """One bitonic stage: partner distance 2^j inside 2^(k+1)-wide runs."""
    key = arrays[0]
    pkey = _partner(key, j)
    # is_low == asc  <=>  bit j of i == bit (k+1) of i.  Avoid bool-on-bool
    # ops (Mosaic cannot lower them); select u32 operands instead, which also
    # gives the no-swap-on-equal comparator: on ties BOTH sides keep their
    # own element, so payload selects stay complementary (no dup/loss).
    fwd_dir = _bit(key.shape, j) == _bit(key.shape, k + 1)
    a = jnp.where(fwd_dir, key, pkey)
    b = jnp.where(fwd_dir, pkey, key)
    take_mine = a <= b
    out = [jnp.where(take_mine, key, pkey)]
    for a in arrays[1:]:
        out.append(jnp.where(take_mine, a, _partner(a, j)))
    return out


def _sort_network(arrays):
    """Full bitonic sort network over the (ROWS, LANES) tile."""
    rows, lanes = arrays[0].shape
    n_bits = (rows * lanes).bit_length() - 1
    for k in range(n_bits):          # run width 2^(k+1)
        for j in range(k, -1, -1):   # exchange distance 2^j
            arrays = _compare_exchange(arrays, j, k)
    return arrays


def _merge_network(arrays):
    """Bitonic *merge* only (input must be bitonic, e.g. asc++desc halves)."""
    rows, lanes = arrays[0].shape
    n_bits = (rows * lanes).bit_length() - 1
    k = n_bits - 1
    for j in range(k, -1, -1):
        arrays = _compare_exchange(arrays, j, k)
    return arrays


def _sort_kernel(*refs, n_ops: int, pad_rows: int):
    ins, outs = refs[:n_ops], refs[n_ops:]
    arrays = [r[0] for r in ins]  # (ROWS, LANES)
    if pad_rows:
        # virtual padding to the next power of two: pad sortkeys are the max
        # uint32, so they sort past every real element and are never written
        # back (only the first ROWS rows are stored)
        rows = arrays[0].shape[0]
        pad0 = jnp.full((pad_rows, LANES), 0xFFFFFFFF, jnp.uint32)
        padded = [jnp.concatenate([arrays[0], pad0], axis=0)]
        for a in arrays[1:]:
            padded.append(
                jnp.concatenate([a, jnp.zeros((pad_rows, LANES), a.dtype)], 0)
            )
        arrays = _sort_network(padded)
        arrays = [a[:rows] for a in arrays]
    else:
        arrays = _sort_network(arrays)
    for o, a in zip(outs, arrays):
        o[0] = a


def sort_tiles(
    operands: Sequence[jax.Array],
    *,
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
    shaped = [o.reshape(T, rows, LANES) for o in ops]

    out = pl.pallas_call(
        functools.partial(_sort_kernel, n_ops=n, pad_rows=pad_rows),
        out_shape=[jax.ShapeDtypeStruct((T, rows, LANES), o.dtype) for o in ops],
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in ops
        ],
        out_specs=[
            pl.BlockSpec((1, rows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in ops
        ],
        interpret=interpret,
    )(*shaped)
    return tuple(o.reshape(T, K) for o in out)
