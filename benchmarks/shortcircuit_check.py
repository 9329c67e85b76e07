"""On-chip check of the already-sorted/constant-input short-circuit.

VERDICT r3 missing #1: entropy-0 (constant keys) should run at ~memcpy
speed; the reference gets FASTER on duplicates.  The host tier now
detects a sorted strided sample, confirms with one device comparison
pass, and returns the input unchanged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp
import numpy as np

import tpusort


def main():
    n = 1 << 28
    for name, arr in (
        ("constant", jnp.zeros((n,), jnp.uint32)),
        ("presorted", jnp.arange(n, dtype=jnp.uint32)),
    ):
        arr = jax.device_put(arr)
        # warm the check's jit once
        out = tpusort.sort(arr, algorithm="msd")
        np.asarray(out[:8])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = tpusort.sort(arr, algorithm="msd")
            np.asarray(out[:8])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        ok = bool(np.asarray(out[0] == arr[0])) and bool(
            np.asarray(out[-1] == arr[-1]))
        print(json.dumps({
            "input": name, "log2n": 28, "ms": round(dt * 1e3, 2),
            "gkeys_per_s": round(n / dt / 1e9, 2), "head_tail_ok": ok,
        }), flush=True)


if __name__ == "__main__":
    main()
