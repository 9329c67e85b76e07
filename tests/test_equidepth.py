"""Equi-depth splitter engine tests (interpret mode, CPU).

The adaptive skew tier: balanced buckets for distributions that overflow
the radix engine's static capacities (entropy-reduced, Zipfian, constant).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpusort
from tpusort import dtypes as td
from tpusort.ops import equidepth, msd
from tpusort.utils import datagen
from oracle import np_sort_oracle

SMALL = dict(k=2048, r=8, s1=384, s=256, leaf_max=4096, min_n=1,
             sample_log2=15)


def _eq_sort(keys, plan_kwargs=SMALL, use_pallas=True):
    planes, traits = td.twiddle_in(keys)
    sp, _ = equidepth.sort_twiddled_equidepth(
        planes, (), begin_bit=0, end_bit=32, total_bits=32,
        use_pallas=use_pallas, plan_kwargs=dict(plan_kwargs),
    )
    return td.twiddle_out(sp, traits, dtype=keys.dtype)


@pytest.mark.slow
@pytest.mark.parametrize("entropy", [1, 2, 4, 0])
def test_equidepth_entropy_matrix(entropy):
    """The whole point: skewed digit distributions must sort exactly (and,
    for moderate skew, without the overflow fallback — checked below)."""
    n = 60_000
    keys = datagen.entropy_keys(jax.random.key(entropy + 1), n, entropy,
                                "uint32")
    got = _eq_sort(keys)
    np.testing.assert_array_equal(np.asarray(got),
                                  np_sort_oracle(np.asarray(keys)))


@pytest.mark.slow
def test_equidepth_zipf():
    n = 60_000
    keys = datagen.zipf_keys(jax.random.key(7), n, alpha=1.2,
                             dtype=jnp.uint32)
    got = _eq_sort(keys)
    np.testing.assert_array_equal(np.asarray(got),
                                  np_sort_oracle(np.asarray(keys)))


@pytest.mark.slow
def test_equidepth_float():
    n = 60_000
    keys = jax.random.normal(jax.random.key(8), (n,), jnp.float32) ** 3
    got = _eq_sort(keys)
    want = np_sort_oracle(np.asarray(keys))
    assert np.array_equal(np.asarray(got).view(np.uint8), want.view(np.uint8))


@pytest.mark.slow
def test_equidepth_presorted():
    """Pre-sorted input (pathological for radix capacity) stays exact."""
    n = 50_000
    keys = jnp.sort(datagen.random_keys(jax.random.key(9), n, "uint32"))
    got = _eq_sort(keys)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(keys))


def test_equidepth_api_dispatch():
    """``algorithm="msd_equidepth"`` must route through the registered
    equi-depth engine slot and return its result (wiring only — the full
    interpret-mode pipeline is the slow variant below; it costs ~100 s of
    XLA-CPU compile).  The spy delegates to the reference engine so the
    output equality still proves the engine's result is what comes back."""
    from tpusort.api import register_engine, sort_twiddled_reference

    calls = []

    def spy(planes, values, **kw):
        calls.append(1)
        kw.pop("config", None)
        kw.pop("stable", None)
        return sort_twiddled_reference(planes, values, **kw)

    try:
        register_engine("msd_equidepth", spy)
        n = 6_000
        keys = datagen.entropy_keys(jax.random.key(10), n, 3, "uint32")
        got = tpusort.sort(keys, algorithm="msd_equidepth")
    finally:
        register_engine("msd_equidepth", equidepth.sort_twiddled_equidepth)
    assert calls, "msd_equidepth did not reach the registered engine"
    np.testing.assert_array_equal(np.asarray(got),
                                  np_sort_oracle(np.asarray(keys)))


@pytest.mark.slow
def test_equidepth_api_dispatch_full():
    n = 40_000
    keys = datagen.entropy_keys(jax.random.key(10), n, 3, "uint32")
    got = tpusort.sort(keys, algorithm="msd_equidepth")
    np.testing.assert_array_equal(np.asarray(got),
                                  np_sort_oracle(np.asarray(keys)))


def _overflow_flag(keys, plan_kwargs=SMALL):
    """Run the equidepth pipeline and return its overflow flag (the silent
    fallback would mask kernel bugs behind exact-but-slow output)."""
    planes, _ = td.twiddle_in(keys)
    n = keys.shape[0]
    kwargs, _, sample_log2, m_sample, leaf_max = equidepth._prepare(
        n, dict(plan_kwargs))
    plan = msd.plan_msd(n, 0, 32, **kwargs)
    plan = equidepth._widen_last(plan, n, m_sample, leaf_max)
    q = equidepth._quantile_table(
        planes, n, plan.passes[0].r ** len(plan.passes) - 1,
        sample_log2=sample_log2)
    _, overflow = equidepth._run_pipeline(planes, (), n, plan, q, True)
    return bool(overflow)


@pytest.mark.slow
@pytest.mark.parametrize("entropy", [1, 2, 0])
def test_equidepth_no_false_fallback(entropy):
    n = 60_000
    keys = datagen.entropy_keys(jax.random.key(20 + entropy), n, entropy,
                                "uint32")
    assert not _overflow_flag(keys), \
        f"equidepth overflow fired on entropy={entropy}"


@pytest.mark.slow
def test_equidepth_presorted_no_fallback():
    """Presorted input concentrates each contiguous tile into one bucket;
    the strided tile assignment (every tile mirrors the global
    distribution) must absorb it without the fallback."""
    n = 60_000
    keys = jnp.sort(datagen.random_keys(jax.random.key(31), n, "uint32"))
    assert not _overflow_flag(keys), "presorted tripped the fallback"


def test_msd_skew_tier_dispatch():
    """The default engine's three-tier fallback: radix overflow routes
    through the equi-depth pipeline (then reference).  Constant keys
    overflow the radix capacities deterministically, so this exercises
    the tier; exactness is the observable."""
    n = 60_000
    keys = datagen.entropy_keys(jax.random.key(40), n, 0, "uint32")
    planes, traits = td.twiddle_in(keys)
    sp, _ = msd.sort_twiddled_msd(
        planes, (), begin_bit=0, end_bit=32, total_bits=32,
        use_pallas=False, skew_tier=True,
    )
    got = td.twiddle_out(sp, traits, dtype=keys.dtype)
    np.testing.assert_array_equal(np.asarray(got),
                                  np_sort_oracle(np.asarray(keys)))


@pytest.mark.slow
def test_equidepth_zipf_no_fallback():
    """Zipfian duplication: heavy values span multiple splitters (repeated
    splitter values), strided tiles mirror the global mass, and the
    capacity-clipped tie spreading absorbs the span — no fallback."""
    n = 60_000
    keys = datagen.zipf_keys(jax.random.key(30), n, alpha=1.2,
                             dtype=jnp.uint32)
    assert not _overflow_flag(keys), "zipf tripped the fallback"


# ---------------------------------------------------------------------------
# Universal skew tier (round 2): pairs, u64 planes, composite stable pairs
# ---------------------------------------------------------------------------

TINY = dict(k=1024, r=8, s1=256, s=128, leaf_max=2048, min_n=1,
            sample_log2=13)


def _twiddle_u32(keys):
    planes, traits = td.twiddle_in(keys)
    return planes, traits


@pytest.mark.slow
def test_equidepth_pairs_unstable():
    """Payloads ride the raw splitter network (unstable semantics):
    permutation check, not positional equality."""
    n = 20_000
    keys = datagen.zipf_keys(jax.random.key(60), n, alpha=1.2,
                             dtype=jnp.uint32)
    vals = datagen.enumerated_values(n)
    planes, traits = td.twiddle_in(keys)
    (sp,), (sv,) = equidepth.sort_twiddled_equidepth(
        planes, (vals,), begin_bit=0, end_bit=32, total_bits=32,
        use_pallas=True, plan_kwargs=dict(TINY),
    )
    got_k = np.asarray(td.twiddle_out((sp,), traits, dtype=keys.dtype))
    got_v = np.asarray(sv)
    np.testing.assert_array_equal(got_k, np_sort_oracle(np.asarray(keys)))
    # every output pair maps back to its original key; checksum exact
    assert int(got_v.astype(np.uint64).sum()) == n * (n - 1) // 2
    np.testing.assert_array_equal(np.asarray(keys)[got_v], got_k)


@pytest.mark.slow
def test_equidepth_u64_planes():
    """2-plane (u64) keys: lexicographic splitter comparisons.  Skewed hi
    plane (few distinct hi words) exercises multi-plane tie handling."""
    n = 20_000
    rng = np.random.default_rng(61)
    hi = rng.integers(0, 4, n).astype(np.uint32)     # heavy hi-plane skew
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    (ohi, olo), _ = equidepth.sort_twiddled_equidepth(
        (jnp.asarray(hi), jnp.asarray(lo)), (), begin_bit=0, end_bit=64,
        total_bits=64, use_pallas=True, plan_kwargs=dict(TINY),
    )
    got = (np.asarray(ohi).astype(np.uint64) << 32) | np.asarray(olo)
    want = np.sort((hi.astype(np.uint64) << 32) | lo.astype(np.uint64))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_equidepth_stable_pairs_composite():
    """Stable pairs via the composite (key, position) plane trick: equal
    keys keep input order even under Zipfian duplication."""
    n = 20_000
    keys = datagen.zipf_keys(jax.random.key(62), n, alpha=1.2,
                             dtype=jnp.uint32)
    vals = datagen.enumerated_values(n)
    planes, traits = td.twiddle_in(keys)
    (sp,), (sv,) = equidepth.sort_twiddled_equidepth(
        planes, (vals,), begin_bit=0, end_bit=32, total_bits=32,
        use_pallas=True, plan_kwargs=dict(TINY), stable=True,
    )
    got_k = np.asarray(td.twiddle_out((sp,), traits, dtype=keys.dtype))
    wk, wv = np_sort_oracle(np.asarray(keys), np.asarray(vals))
    np.testing.assert_array_equal(got_k, wk)
    np.testing.assert_array_equal(np.asarray(sv), wv)


def test_equidepth_flag_mode_shapes():
    """Flag mode returns (planes, values, overflow) and never conds; the
    delegation path returns overflow=False."""
    n = 2_000
    keys = datagen.random_keys(jax.random.key(63), n, "uint32")
    planes, _ = td.twiddle_in(keys)
    sp, sv, ovf = equidepth.sort_twiddled_equidepth(
        planes, (), begin_bit=0, end_bit=32, total_bits=32,
        use_pallas=False, plan_kwargs=dict(min_n=1 << 20),
        on_overflow="flag",
    )
    assert not bool(ovf)
    np.testing.assert_array_equal(
        np.sort(np.asarray(planes[0])), np.asarray(sp[0]))
