"""Histogram ops (the DeviceHistogram subset of the reference's library,
``lsb/cub/cub/device/device_histogram.cuh`` — SURVEY.md L-10), plus the
digit-histogram primitive the radix engines use (the analog of
``rdxsrt_histogram``, ``msb/src/sort/cuda_radix_sort.h:666-802``).

TPU realization: one-hot compare + sum (vectorized, atomic-free) — the
direct replacement for the reference's shared-memory atomics + RLE
pre-sorting tricks, which exist only because GPUs histogram through
atomics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["histogram_even", "digit_histogram"]


def histogram_even(
    x: jax.Array, num_bins: int, lo, hi, *, dtype=jnp.int32
) -> jax.Array:
    """Counts of x in num_bins equal-width bins spanning [lo, hi)."""
    xf = x.astype(jnp.float32)
    width = (jnp.float32(hi) - jnp.float32(lo)) / num_bins
    bin_ = jnp.floor((xf - jnp.float32(lo)) / width).astype(jnp.int32)
    in_range = (x >= lo) & (x < hi)
    bin_ = jnp.where(in_range, jnp.clip(bin_, 0, num_bins - 1), num_bins)
    oh = bin_[:, None] == jnp.arange(num_bins + 1, dtype=jnp.int32)
    return oh.sum(axis=0, dtype=dtype)[:num_bins]


def digit_histogram(
    keys_u32: jax.Array, shift: int, bits: int, *, tiles: int = 1,
    dtype=jnp.int32,
) -> jax.Array:
    """Per-tile counts of the ``bits``-wide digit at ``shift``.

    keys_u32: (N,) twiddled keys with N divisible by tiles; returns
    (tiles, 2**bits).
    """
    r = 1 << bits
    d = (keys_u32.reshape(tiles, -1) >> jnp.uint32(shift)) & jnp.uint32(r - 1)
    oh = d[:, :, None] == jnp.arange(r, dtype=jnp.uint32)
    return oh.sum(axis=1, dtype=dtype)
