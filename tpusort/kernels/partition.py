"""Pallas TPU partition-pass kernel: fused tile sort + padded run expand.

The TPU-native replacement for the reference's partition/scatter kernel
(``msb/src/sort/cuda_radix_sort.h:374-641`` ``rdxsrt_partition_keys``): where
the CUDA kernel ranks keys with atomics on shared-memory bucket offsets and
scatters through global memory, this kernel

  1. sorts the VMEM-resident tile by a (digit, idx) sortkey with the bitonic
     compare-exchange network (stable binning, no atomics),
  2. expands the R digit runs to padded capacity S with dynamic-start
     element-granular VMEM slices (sublane slice + dynamic lane rotate +
     boundary select — the only data-dependent movement TPU does well),
  3. writes the (R*S,) padded tile; the digit-major global exchange is then
     a free XLA transpose outside the kernel.

Run starts come in precomputed per tile (exclusive scan of the one-hot
histogram, done in XLA); slots past a run's count hold garbage that
downstream passes treat as positionally invalid.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusort.kernels.bitonic import LANES, _sort_network


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


def _partition_kernel(starts_ref, *refs, n_data: int, r: int, s: int):
    # refs = [sortkey_in, data_in x n_data, data_out x n_data,
    #         scratch x n_data]
    ins = refs[: 1 + n_data]
    outs = refs[1 + n_data : 1 + 2 * n_data]
    scratch = refs[1 + 2 * n_data :]
    arrays = [ref[0] for ref in ins]          # (rows, 128)
    arrays = _sort_network(arrays)
    rows = arrays[0].shape[0]
    srows = s // LANES
    for sc, a in zip(scratch, arrays[1:]):
        sc[:rows] = a                          # tail rows stay garbage:
        # slots past a run's count are positionally invalid downstream
    for d in range(r):
        start = starts_ref[0, 0, d]
        for o, sc in zip(outs, scratch):
            o[0, d * srows : (d + 1) * srows] = _dynamic_run_slice(
                sc, start, srows
            )


def partition_tiles(
    ops: Sequence[jax.Array],
    starts: jax.Array,
    *,
    r: int,
    s: int,
    interpret: Optional[bool] = None,
) -> List[jax.Array]:
    """Fused sort+expand over tiles.

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
    shaped = [o.reshape(T, rows, LANES) for o in ops]

    out = pl.pallas_call(
        functools.partial(_partition_kernel, n_data=n_data, r=r, s=s),
        out_shape=[
            jax.ShapeDtypeStruct((T, r * srows, LANES), jnp.uint32)
            for _ in range(n_data)
        ],
        grid=(T,),
        in_specs=[
            # (T, 1, 128): starts padded to a lane row (TPU block tiling
            # rules); per-digit reads are static scalar loads
            pl.BlockSpec((1, 1, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((1, rows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(1 + n_data)
        ],
        out_specs=[
            pl.BlockSpec((1, r * srows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_data)
        ],
        scratch_shapes=[
            pltpu.VMEM((rows + srows + 1, LANES), jnp.uint32)
            for _ in range(n_data)
        ],
        interpret=interpret,
    )(
        jnp.pad(starts.astype(jnp.int32), ((0, 0), (0, LANES - r)))[:, None, :],
        *shaped,
    )
    return [o.reshape(T, r * s) for o in out]
