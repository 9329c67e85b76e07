"""Independent numpy oracle used by all sort tests.

Mirrors the reference's oracle strategy (CUB as trusted sorter,
``msb/tests/test_sort_keys.cu:14-45``; CPU ``std::stable_sort`` in CUB's own
tests, ``lsb/cub/test/test_device_radix_sort.cu``): a from-first-principles
numpy implementation of the same bitwise key ordering, written independently
of the library code so bugs can't cancel out.
"""

from __future__ import annotations

import numpy as np


def np_twiddle(keys: np.ndarray) -> np.ndarray:
    """Order-preserving map to unsigned ints (numpy, independent impl)."""
    dt = keys.dtype
    if dt == np.uint32 or dt == np.uint64:
        return keys.copy()
    if dt == np.int32:
        return keys.view(np.uint32) ^ np.uint32(0x80000000)
    if dt == np.int64:
        return keys.view(np.uint64) ^ np.uint64(0x8000000000000000)
    if dt == np.float32:
        u = keys.view(np.uint32)
        neg = (u >> np.uint32(31)).astype(bool)
        return np.where(neg, ~u, u ^ np.uint32(0x80000000))
    if dt == np.float64:
        u = keys.view(np.uint64)
        neg = (u >> np.uint64(63)).astype(bool)
        return np.where(neg, ~u, u ^ np.uint64(0x8000000000000000))
    raise TypeError(dt)


def np_sort_oracle(
    keys: np.ndarray,
    values: np.ndarray | None = None,
    *,
    descending: bool = False,
    begin_bit: int = 0,
    end_bit: int | None = None,
):
    """Stable sort matching tpusort semantics exactly (bitwise key order)."""
    t = np_twiddle(np.asarray(keys))
    bits = t.dtype.itemsize * 8
    eb = bits if end_bit is None else end_bit
    if begin_bit != 0 or eb != bits:
        # Python ints: np.uint64(1) << 64 (eb == bits == 64 with a nonzero
        # begin_bit) is a shift >= width — undefined in numpy
        mask = (((1 << eb) - 1) & ~((1 << begin_bit) - 1)) & ((1 << bits) - 1)
        t = t & t.dtype.type(mask)
    if descending:
        t = ~t
    perm = np.argsort(t, kind="stable")
    out_keys = np.asarray(keys)[perm]
    if values is None:
        return out_keys
    return out_keys, np.asarray(values)[perm]
