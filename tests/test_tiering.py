"""Host-owned tiering: radix flag-mode -> equi-depth -> exact.

The TPU analog of the reference's CPU-in-the-loop pass planner
(``msb/src/sort/gpu_radix_sort.cu:29-104``): the host reads a tiny overflow
flag and re-dispatches, so no in-graph fallback workspace is ever reserved
(what capped the in-graph engine at 2^29 keys and gated the skew tier to
n < 2^28 in round 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpusort
from tpusort.configs import SortConfig, get_config, register_config
from tpusort.utils import datagen
from oracle import np_sort_oracle


def _with_cfg(cfg, fn):
    platform = jax.default_backend()
    saved = get_config(32, False), get_config(32, True)
    register_config(32, False, platform, cfg)
    register_config(32, True, platform, cfg)
    try:
        return fn()
    finally:
        register_config(32, False, platform, saved[0])
        register_config(32, True, platform, saved[1])


CPU_CFG = SortConfig(tile_elems=2048, radix=16, s1=256, min_n=4096)


def test_tier_overflow_routes_to_exact():
    """Constant keys overflow the radix capacities deterministically; the
    host chain must land on the exact tier and return oracle output."""
    n = 20_000
    keys = jnp.zeros((n,), jnp.uint32) + jnp.uint32(7)

    def run():
        return np.asarray(tpusort.sort(keys, algorithm="msd"))

    got = _with_cfg(CPU_CFG, run)
    np.testing.assert_array_equal(got, np.full(n, 7, np.uint32))


def test_tier_no_overflow_single_dispatch():
    n = 20_000
    keys = datagen.random_keys(jax.random.key(3), n, "uint32")

    def run():
        return np.asarray(tpusort.sort(keys, algorithm="msd"))

    got = _with_cfg(CPU_CFG, run)
    np.testing.assert_array_equal(got, np_sort_oracle(np.asarray(keys)))


def test_tier_pairs_stable_overflow():
    """Stable pairs through the tier chain on skewed input stay stable."""
    n = 20_000
    keys = datagen.entropy_keys(jax.random.key(4), n, 0, "uint32")
    vals = datagen.enumerated_values(n)

    def run():
        gk, gv = tpusort.sort(keys, vals, algorithm="msd")
        return np.asarray(gk), np.asarray(gv)

    gk, gv = _with_cfg(CPU_CFG, run)
    wk, wv = np_sort_oracle(np.asarray(keys), np.asarray(vals))
    np.testing.assert_array_equal(gk, wk)
    np.testing.assert_array_equal(gv, wv)


def test_sort_inside_jit_uses_in_graph_fallback():
    """Inside a user jit the keys are tracers: the in-graph lax.cond path
    must apply (host tiering needs concrete inputs) and stay exact."""
    n = 20_000
    keys = datagen.entropy_keys(jax.random.key(5), n, 0, "uint32")

    @jax.jit
    def f(k):
        return tpusort.sort(k, algorithm="msd")

    got = _with_cfg(CPU_CFG, lambda: np.asarray(f(keys)))
    np.testing.assert_array_equal(got, np_sort_oracle(np.asarray(keys)))


@pytest.mark.slow
def test_tier_equidepth_engaged():
    """With skew_tier=True the equi-depth tier runs between radix and
    exact (interpret mode on CPU — slow).  Zipfian input overflows radix
    but fits equi-depth; output must be oracle-exact either way."""
    n = 20_000
    cfg = SortConfig(tile_elems=1024, radix=8, s1=256, min_n=4096,
                     skew_tier=True, skew_sample_log2=13)
    keys = datagen.zipf_keys(jax.random.key(6), n, alpha=1.2,
                             dtype=jnp.uint32)

    def run():
        return np.asarray(tpusort.sort(keys, algorithm="msd", stable=False))

    got = _with_cfg(cfg, run)
    np.testing.assert_array_equal(got, np_sort_oracle(np.asarray(keys)))
