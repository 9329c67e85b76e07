"""Native host runtime tests (C++ oracle via ctypes, numpy cross-check)."""

import numpy as np
import pytest

from tpusort.runtime import native


def test_native_available():
    # g++ is baked into this image; the library must build
    assert native.available()


def test_stable_sort_u32(rng):
    x = rng.integers(0, 2**32, 100000, dtype=np.uint32)
    np.testing.assert_array_equal(native.stable_sort(x), np.sort(x))


def test_stable_sort_u64(rng):
    x = rng.integers(0, 2**64, 50000, dtype=np.uint64)
    np.testing.assert_array_equal(native.stable_sort(x), np.sort(x))


def test_stable_argsort_matches_numpy(rng):
    x = (rng.integers(0, 2**32, 80000, dtype=np.uint32) & 0xFFF).astype(
        np.uint32
    )  # heavy ties exercise stability
    got = native.stable_argsort(x)
    want = np.argsort(x, kind="stable")
    np.testing.assert_array_equal(got.astype(np.int64), want)
    x64 = x.astype(np.uint64) << np.uint64(32)
    got64 = native.stable_argsort(x64)
    np.testing.assert_array_equal(got64.astype(np.int64),
                                  np.argsort(x64, kind="stable"))


def test_first_unsorted(rng):
    x = np.sort(rng.integers(0, 2**32, 10000, dtype=np.uint32))
    assert native.first_unsorted(x) == -1
    y = x.copy()
    y[5000] = 0
    idx = native.first_unsorted(y)
    assert idx in (5000, 5001)


def test_verify_pairs(rng):
    n = 50000
    keys = rng.integers(0, 1000, n, dtype=np.uint32)
    order = np.argsort(keys, kind="stable")
    assert native.verify_pairs(keys, keys[order],
                               order.astype(np.uint32)) == -1
    bad_vals = order.astype(np.uint32).copy()
    bad_vals[7] = bad_vals[8]  # duplicate -> not a permutation
    assert native.verify_pairs(keys, keys[order], bad_vals) != -1


def test_native_mt_sort_matches_single_thread():
    """Multithreaded striped-spine LSD must match the stable oracle."""
    from tpusort.runtime import native
    if not native.available():
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**32, 1_500_000, dtype=np.uint32)
    out = native.stable_sort(keys)
    np.testing.assert_array_equal(out, np.sort(keys, kind="stable"))
    idx = native.stable_argsort(keys)
    np.testing.assert_array_equal(keys[idx], np.sort(keys, kind="stable"))
    # stability: equal keys keep original order
    dup = (rng.integers(0, 16, 500_000, dtype=np.uint32))
    idx2 = native.stable_argsort(dup)
    np.testing.assert_array_equal(idx2, np.argsort(dup, kind="stable"))
