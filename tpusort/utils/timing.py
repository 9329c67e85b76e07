"""Device timing utilities.

The analog of the reference's timer layer (``lsb/gpu_utils.h:3-11``
SETUP_TIMING/TIME_FUNC cudaEvent macros; ``msb/external/benchmark/
get_real_time.cu`` wall clock) with one TPU-specific twist: on tunneled
backends ``block_until_ready`` does not actually block, so completion is
forced by fetching a tiny probe slice of the output through a separate jit
boundary, and the dispatch+probe overhead is measured and subtracted
(DESIGN.md "measurement discipline").
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import numpy as np

__all__ = ["sync", "measure", "measure_overhead", "honor_explicit_cpu"]


def honor_explicit_cpu() -> None:
    """Honor JAX_PLATFORMS=cpu from the environment.

    The deployment's sitecustomize force-selects the tunneled TPU platform
    and overrides even the env var, so CLI drivers that want CPU smoke runs
    must set the config programmatically BEFORE the first device query —
    call this at the top of every benchmark ``main()``."""
    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")


@jax.jit
def _probe(o):
    return jax.tree.map(lambda a: a.ravel()[:8], o)


def sync(out) -> None:
    """Force full materialization of ``out`` on device."""
    np.asarray(jax.tree.leaves(_probe(out))[0])


_OVERHEAD_CACHE: Optional[float] = None


def measure_overhead(refresh: bool = False) -> float:
    """Dispatch + probe round-trip cost in seconds (cached)."""
    global _OVERHEAD_CACHE
    if _OVERHEAD_CACHE is not None and not refresh:
        return _OVERHEAD_CACHE
    import jax.numpy as jnp

    f = jax.jit(lambda a: a)
    x = jnp.zeros((8,), jnp.uint32)
    sync(f(x))
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        sync(f(x))
        times.append(time.perf_counter() - t0)
    _OVERHEAD_CACHE = min(times)
    return _OVERHEAD_CACHE


def measure(
    fn: Callable, *args, iters: int = 3, warmup: int = 1,
    subtract_overhead: bool = True,
) -> float:
    """Best-of-iters wall time of jitted ``fn(*args)`` in seconds."""
    fn = jax.jit(fn)
    sync(fn(*args))
    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    if subtract_overhead:
        dt = max(dt - measure_overhead(), 1e-9)
    return dt


def measure_eager(
    fn: Callable, *args, iters: int = 3, warmup: int = 1,
    subtract_overhead: bool = True,
) -> float:
    """Best-of-iters wall time of EAGER ``fn(*args)`` in seconds.

    No jit wrapper: host-owned control flow (the public API's tier chain,
    sample pre-classifier, flag-mode re-dispatch) executes for real — a
    traced call would see Tracers, fail ``_host_tiered_applicable``, and
    silently time the in-graph lax.cond path instead.  Inner jitted impls
    are compile-cached by the warmup calls."""
    sync(fn(*args))
    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    if subtract_overhead:
        dt = max(dt - measure_overhead(), 1e-9)
    return dt
