"""Pallas TPU kernels for device-scope scan and histogram (SURVEY L-10).

TPU-native re-design of the reference's vendored CUB device primitives:

* ``prefix_sum_tiles`` replaces ``DeviceScan`` (``lsb/cub/cub/device/
  device_scan.cuh``).  CUB needs the decoupled-lookback protocol because
  GPU thread blocks run concurrently with no ordering; a TPU core runs its
  Pallas grid SEQUENTIALLY, so a single SMEM carry register threaded
  across grid steps gives an exact one-pass scan — no lookback, no
  spin-wait, no status flags.  In-tile prefixes are log-shift adds on the
  lane axis and a sublane pass over row totals (no gather).
* ``digit_histogram_tiles`` replaces the histogram side of
  ``DeviceHistogram`` (``device_histogram.cuh``) and the radix histogram
  kernel (``msb/src/sort/cuda_radix_sort.h:666-802``): bins accumulate in
  a VMEM scratch vector across grid steps (the sequential-grid analog of
  shared-memory atomics; atomic-free by construction) and are written once
  at the last step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusort.kernels.bitonic import LANES

__all__ = ["prefix_sum_tiles", "digit_histogram_tiles",
           "cumsum_lanes", "cumsum_sublanes"]


def cumsum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum along the lane axis via log-shift adds
    (``pltpu.roll`` is cyclic; the lane-index mask zeroes the wrap)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    zero = jnp.zeros((), x.dtype)
    for kk in range(LANES.bit_length() - 1):
        d = 1 << kk
        sh = pltpu.roll(x, d, axis=x.ndim - 1)
        x = x + jnp.where(lane >= d, sh, zero)
    return x


def cumsum_sublanes(x: jax.Array) -> jax.Array:
    """Inclusive prefix sum along the sublane axis."""
    rows = x.shape[x.ndim - 2]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
    zero = jnp.zeros((), x.dtype)
    for kk in range(rows.bit_length() - 1):
        d = 1 << kk
        sh = pltpu.roll(x, d, axis=x.ndim - 2)
        x = x + jnp.where(row >= d, sh, zero)
    return x


def _scan_kernel(x_ref, o_ref, carry_ref, *, exclusive: bool):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        carry_ref[0, 0] = jnp.zeros((), x_ref.dtype)

    x = x_ref[0]
    carry = carry_ref[0, 0]
    inc = cumsum_lanes(x)
    row_tot = inc[:, LANES - 1 : LANES]                    # (rows, 1)
    row_pref = cumsum_sublanes(row_tot) - row_tot          # exclusive rows
    full = carry + row_pref + (inc - x if exclusive else inc)
    o_ref[0] = full
    carry_ref[0, 0] = carry + jnp.sum(x)


def prefix_sum_tiles(
    x: jax.Array,
    *,
    exclusive: bool = False,
    tile_rows: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Exact one-pass prefix sum of a 1-D array on the TPU core.

    The carry rides an SMEM register across the sequential grid — the
    TPU-native replacement for CUB's decoupled lookback.  Integer sums
    wrap like ``jnp.cumsum``; float32 sums accumulate in input precision.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = jnp.asarray(x)
    if x.ndim != 1:
        raise ValueError("prefix_sum_tiles expects a 1-D array")
    n = x.shape[0]
    k = tile_rows * LANES
    m = -(-max(n, 1) // k) * k
    xp = jnp.pad(x, (0, m - n))
    T = m // k
    shaped = xp.reshape(T, tile_rows, LANES)
    spec = pl.BlockSpec((1, tile_rows, LANES), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_scan_kernel, exclusive=exclusive),
        out_shape=jax.ShapeDtypeStruct(shaped.shape, x.dtype),
        grid=(T,),
        in_specs=[spec],
        out_specs=spec,
        scratch_shapes=[pltpu.SMEM((1, 1), x.dtype)],
        interpret=interpret,
    )(shaped)
    return out.reshape(-1)[:n]


def _hist_kernel(x_ref, o_ref, acc_ref, *, r: int, shift: int, nt: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    d = (x_ref[0] >> jnp.uint32(shift)) & jnp.uint32(r - 1)
    counts = [
        jnp.sum((d == jnp.uint32(j)).astype(jnp.int32)) for j in range(r)
    ]
    acc_ref[...] = acc_ref[...] + jnp.stack(counts)[None, :]

    @pl.when(t == nt - 1)
    def _emit():
        o_ref[...] = acc_ref[...]


def digit_histogram_tiles(
    keys_u32: jax.Array,
    shift: int,
    bits: int,
    *,
    tile_rows: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Global counts of the ``bits``-wide digit at ``shift`` over a 1-D
    uint32 array whose length divides the tile size.  Returns (2**bits,)
    int32.  Bins accumulate in VMEM scratch across the sequential grid."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r = 1 << bits
    x = jnp.asarray(keys_u32)
    n = x.shape[0]
    k = tile_rows * LANES
    if n % k:
        raise ValueError(f"n={n} must divide the tile size {k}")
    T = n // k
    shaped = x.reshape(T, tile_rows, LANES)
    out = pl.pallas_call(
        functools.partial(_hist_kernel, r=r, shift=shift, nt=T),
        out_shape=jax.ShapeDtypeStruct((1, r), jnp.int32),
        grid=(T,),
        in_specs=[pl.BlockSpec((1, tile_rows, LANES), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, r), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, r), jnp.int32)],
        interpret=interpret,
    )(shaped)
    return out[0]
