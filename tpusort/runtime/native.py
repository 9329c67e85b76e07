"""ctypes bindings to the native host runtime (csrc/libtpusort_host.so).

Builds on demand with the csrc Makefile (g++; pybind11 is not available in
this image, so the library exposes a C ABI).  Every entry point has a numpy
fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libtpusort_host.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-s"], cwd=os.path.abspath(_CSRC), check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.ts_real_time.restype = ctypes.c_double
    lib.ts_sort_u32.argtypes = [u32p, u32p, ctypes.c_size_t]
    lib.ts_sort_u32_mt.argtypes = [u32p, u32p, ctypes.c_size_t, ctypes.c_int]
    lib.ts_argsort_u32_mt.argtypes = [u32p, u32p, ctypes.c_size_t,
                                      ctypes.c_int]
    lib.ts_sort_u64.argtypes = [u64p, u64p, ctypes.c_size_t]
    lib.ts_argsort_u32.argtypes = [u32p, u32p, ctypes.c_size_t]
    lib.ts_argsort_u64.argtypes = [u64p, u32p, ctypes.c_size_t]
    lib.ts_first_unsorted_u32.restype = ctypes.c_int64
    lib.ts_first_unsorted_u32.argtypes = [u32p, ctypes.c_size_t]
    lib.ts_first_unsorted_u64.restype = ctypes.c_int64
    lib.ts_first_unsorted_u64.argtypes = [u64p, ctypes.c_size_t]
    lib.ts_first_mismatch_u32.restype = ctypes.c_int64
    lib.ts_first_mismatch_u32.argtypes = [u32p, u32p, ctypes.c_size_t]
    lib.ts_verify_pairs_u32.restype = ctypes.c_int64
    lib.ts_verify_pairs_u32.argtypes = [u32p, u32p, u32p, ctypes.c_size_t]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def stable_sort(keys: np.ndarray) -> np.ndarray:
    """Stable LSD radix sort of uint32/uint64 keys (native; numpy fallback)."""
    keys = np.ascontiguousarray(keys)
    lib = _load()
    if lib is None:
        return np.sort(keys, kind="stable")
    out = np.empty_like(keys)
    if keys.dtype == np.uint32:
        # multithreaded striped-spine LSD (CUB upsweep/spine/downsweep on
        # host threads) — the billion-key verification oracle
        lib.ts_sort_u32_mt(_ptr(keys, ctypes.c_uint32),
                           _ptr(out, ctypes.c_uint32), keys.size, 0)
    elif keys.dtype == np.uint64:
        lib.ts_sort_u64(_ptr(keys, ctypes.c_uint64), _ptr(out, ctypes.c_uint64),
                        keys.size)
    else:
        return np.sort(keys, kind="stable")
    return out


def stable_argsort(keys: np.ndarray) -> np.ndarray:
    """Stable argsort (uint32 permutation) of uint32/uint64 keys."""
    keys = np.ascontiguousarray(keys)
    lib = _load()
    if lib is None or keys.size >= 1 << 32:
        return np.argsort(keys, kind="stable").astype(np.uint32)
    idx = np.empty(keys.size, np.uint32)
    if keys.dtype == np.uint32:
        lib.ts_argsort_u32_mt(_ptr(keys, ctypes.c_uint32),
                              _ptr(idx, ctypes.c_uint32), keys.size, 0)
    elif keys.dtype == np.uint64:
        lib.ts_argsort_u64(_ptr(keys, ctypes.c_uint64),
                           _ptr(idx, ctypes.c_uint32), keys.size)
    else:
        return np.argsort(keys, kind="stable").astype(np.uint32)
    return idx


def first_unsorted(keys: np.ndarray) -> int:
    """-1 if nondecreasing else first violating index."""
    keys = np.ascontiguousarray(keys)
    lib = _load()
    if lib is None:
        bad = np.nonzero(keys[:-1] > keys[1:])[0]
        return -1 if bad.size == 0 else int(bad[0] + 1)
    if keys.dtype == np.uint32:
        return int(lib.ts_first_unsorted_u32(_ptr(keys, ctypes.c_uint32),
                                             keys.size))
    if keys.dtype == np.uint64:
        return int(lib.ts_first_unsorted_u64(_ptr(keys, ctypes.c_uint64),
                                             keys.size))
    bad = np.nonzero(keys[:-1] > keys[1:])[0]
    return -1 if bad.size == 0 else int(bad[0] + 1)


def verify_pairs(orig_keys: np.ndarray, out_keys: np.ndarray,
                 out_vals: np.ndarray) -> int:
    """-1 if (out_keys, out_vals) is a valid pair-sort of orig_keys with
    enumerated values, else the first failing index."""
    orig_keys = np.ascontiguousarray(orig_keys, np.uint32)
    out_keys = np.ascontiguousarray(out_keys, np.uint32)
    out_vals = np.ascontiguousarray(out_vals, np.uint32)
    lib = _load()
    if lib is None:
        # match ts_verify_pairs_u32 exactly: index i fails if out_vals[i]
        # is out of [0, n), already used, or gathers the wrong key.  No
        # unchecked fancy indexing (an out-of-range value must REPORT, not
        # IndexError).
        n = orig_keys.size
        in_range = out_vals < n
        ok = in_range.copy()
        ok[in_range] = orig_keys[out_vals[in_range]] == out_keys[in_range]
        if not (in_range.all()
                and np.bincount(out_vals[in_range], minlength=n).max(
                    initial=0) <= 1):
            # exact first-failure semantics need the sequential scan
            seen = np.zeros(n, dtype=bool)
            for i, v in enumerate(out_vals):
                if v >= n or seen[v]:
                    return int(i)
                seen[v] = True
                if not ok[i]:
                    return int(i)
        bad = np.nonzero(~ok)[0]
        return -1 if bad.size == 0 else int(bad[0])
    return int(
        lib.ts_verify_pairs_u32(
            _ptr(orig_keys, ctypes.c_uint32), _ptr(out_keys, ctypes.c_uint32),
            _ptr(out_vals, ctypes.c_uint32), orig_keys.size,
        )
    )
