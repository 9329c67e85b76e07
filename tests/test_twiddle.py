"""Twiddle-layer tests: roundtrip and order preservation for every key dtype.

Covers the semantics of ``Traits<T>::TwiddleIn/TwiddleOut``
(``lsb/cub/cub/util_type.cuh:966-1085``), including the float edge cases the
reference's tests rely on bitwise comparison for (NaN payloads, -0.0 vs +0.0,
infinities — ``msb/tests/test_sort_keys.cu:69-74``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpusort import dtypes as td
from oracle import np_twiddle

DTYPES = ["uint32", "int32", "float32", "uint64", "int64", "float64"]


def _special_values(dtype):
    dt = np.dtype(dtype)
    if dt.kind == "f":
        vals = np.array(
            [0.0, -0.0, 1.5, -1.5, np.inf, -np.inf, np.nan, -np.nan,
             np.finfo(dt).tiny, -np.finfo(dt).tiny, np.finfo(dt).max,
             np.finfo(dt).min],
            dtype=dt,
        )
        # add a NaN with a payload
        u = vals.view(np.uint32 if dt.itemsize == 4 else np.uint64)
        payload_nan = u[6] | (np.uint32(5) if dt.itemsize == 4 else np.uint64(5))
        return np.concatenate([vals, np.array([payload_nan]).astype(u.dtype).view(dt)])
    if dt.kind == "i":
        info = np.iinfo(dt)
        return np.array([0, 1, -1, info.min, info.max, 42, -42], dtype=dt)
    info = np.iinfo(dt)
    return np.array([0, 1, info.max, info.max // 2, 12345], dtype=dt)


@pytest.mark.parametrize("dtype", DTYPES)
def test_roundtrip(dtype, rng):
    n = 1000
    raw = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    dt = np.dtype(dtype)
    keys = (raw.astype(np.uint32) if dt.itemsize == 4 else raw).view(dt)
    keys = np.concatenate([keys, _special_values(dtype)])
    x = jnp.asarray(keys)
    for descending in (False, True):
        planes, traits = td.twiddle_in(x, descending=descending)
        back = td.twiddle_out(planes, traits, descending=descending, dtype=dt)
        # bitwise equality (NaNs must roundtrip exactly)
        assert np.array_equal(
            np.asarray(back).view(np.uint8), keys.view(np.uint8)
        ), f"roundtrip failed for {dtype} descending={descending}"


@pytest.mark.parametrize("dtype", DTYPES)
def test_order_preserving(dtype, rng):
    """Twiddled unsigned order == the reference bitwise key order."""
    n = 4000
    raw = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    dt = np.dtype(dtype)
    keys = (raw.astype(np.uint32) if dt.itemsize == 4 else raw).view(dt)
    keys = np.concatenate([keys, _special_values(dtype)])

    planes, traits = td.twiddle_in(jnp.asarray(keys))
    if traits.planes == 1:
        ours = np.asarray(planes[0]).astype(np.uint64)
    else:
        ours = (np.asarray(planes[0]).astype(np.uint64) << np.uint64(32)) | np.asarray(
            planes[1]
        ).astype(np.uint64)
    expected = np_twiddle(keys).astype(np.uint64)
    # identical permutation ordering <=> identical twiddled ranks
    assert np.array_equal(np.argsort(ours, kind="stable"),
                          np.argsort(expected, kind="stable"))


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_float_total_order(dtype):
    """-NaN < -inf < negatives < -0.0 < +0.0 < positives < +inf < +NaN."""
    dt = np.dtype(dtype)
    udt = np.uint32 if dt.itemsize == 4 else np.uint64
    bits = dt.itemsize * 8
    neg_nan = (np.array([~np.uint64(0)], dtype=np.uint64).astype(udt)).view(dt)[0]
    pos_nan = np.array([(~np.uint64(0)) >> np.uint64(64 - bits + 1)], dtype=np.uint64).astype(udt).view(dt)[0]
    ordered = np.array(
        [neg_nan, -np.inf, -1e3, -1.0, -np.finfo(dt).tiny, -0.0,
         0.0, np.finfo(dt).tiny, 1.0, 1e3, np.inf, pos_nan],
        dtype=dt,
    )
    planes, traits = td.twiddle_in(jnp.asarray(ordered))
    if traits.planes == 1:
        t = np.asarray(planes[0]).astype(np.uint64)
    else:
        t = (np.asarray(planes[0]).astype(np.uint64) << np.uint64(32)) | np.asarray(
            planes[1]
        ).astype(np.uint64)
    assert np.all(np.diff(t.astype(object)) > 0), t
