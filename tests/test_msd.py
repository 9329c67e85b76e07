"""MSD hybrid engine tests (small geometry, CPU).

Mirrors the reference's MSB test matrix (``msb/tests/test_sort_keys.cu``,
``test_sort_pairs.cu``): oracle comparison across types x entropies x sizes,
plus pair stability, bit-range sub-sorts, and the skew/overflow fallback.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpusort
from tpusort import dtypes as td
from tpusort.ops import msd
from tpusort.utils import datagen
from oracle import np_sort_oracle

# small geometry so tests run fast and exercise multiple passes
SMALL = dict(k=2048, r=8, s1=384, s=256, leaf_max=2048, min_n=1)


def _msd_sort(keys, values=None, *, descending=False, begin_bit=0,
              end_bit=None, plan_kwargs=SMALL):
    """Direct engine invocation with small-geometry plan overrides."""
    planes, traits = td.twiddle_in(keys, descending=descending)
    eb = traits.bits if end_bit is None else end_bit
    vt = () if values is None else (values,)
    sp, sv = msd.sort_twiddled_msd(
        planes, vt, begin_bit=begin_bit, end_bit=eb, total_bits=traits.bits,
        use_pallas=False, plan_kwargs=plan_kwargs,
    )
    out = td.twiddle_out(sp, traits, descending=descending, dtype=keys.dtype)
    if values is None:
        return out
    return out, sv[0]


def test_plan_small_geometry():
    p = msd.plan_msd(100_000, 0, 32, **{k: v for k, v in SMALL.items()
                                         if k != "min_n"})
    assert p is not None
    assert len(p.passes) >= 2
    assert p.seg <= 2048 and p.seg % 128 == 0
    assert p.m_final == p.n_segments * p.seg
    for spec in p.passes:
        assert spec.k % (spec.r * 128) == 0


def test_plan_default_geometry():
    p = msd.plan_msd(1 << 26, 0, 32)
    assert p is not None
    assert p.m_final <= 2.1 * (1 << 26)
    assert p.seg <= 16384
    p28 = msd.plan_msd(1 << 28, 0, 32)
    assert p28 is not None and p28.seg <= 16384


@pytest.mark.parametrize("dtype", ["uint32", "int32", "float32", "uint64",
                                    "float64"])
@pytest.mark.parametrize("n", [40_000, 65536])
def test_msd_keys_oracle(dtype, n):
    keys = datagen.random_keys(jax.random.key(n), n, dtype)
    got = _msd_sort(keys)
    want = np_sort_oracle(np.asarray(keys))
    assert np.array_equal(np.asarray(got).view(np.uint8), want.view(np.uint8))


@pytest.mark.parametrize("entropy", [2, 3])
def test_msd_moderate_entropy(entropy):
    """Moderately skewed digits: either the padding absorbs it or the
    overflow fallback fires — output must be exact either way."""
    n = 50_000
    keys = datagen.entropy_keys(jax.random.key(1), n, entropy, "uint32")
    got = _msd_sort(keys)
    want = np_sort_oracle(np.asarray(keys))
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("entropy", [8, 0])
def test_msd_extreme_skew_fallback(entropy):
    """Entropy 8 / constant keys overflow every run -> lax.cond fallback."""
    n = 40_000
    keys = datagen.entropy_keys(jax.random.key(2), n, entropy, "uint32")
    got = _msd_sort(keys)
    want = np_sort_oracle(np.asarray(keys))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_msd_pairs_stable():
    n = 40_000
    keys = datagen.entropy_keys(jax.random.key(3), n, 2, "uint32")
    vals = datagen.enumerated_values(n)
    gk, gv = _msd_sort(keys, vals)
    wk, wv = np_sort_oracle(np.asarray(keys), np.asarray(vals))
    np.testing.assert_array_equal(np.asarray(gk), wk)
    np.testing.assert_array_equal(np.asarray(gv), wv)


def test_msd_pairs_float_payload():
    n = 70_000
    keys = datagen.random_keys(jax.random.key(4), n, "uint32")
    vals = jax.random.uniform(jax.random.key(5), (n,), dtype=jnp.float32)
    gk, gv = _msd_sort(keys, vals)
    wk, wv = np_sort_oracle(np.asarray(keys), np.asarray(vals))
    np.testing.assert_array_equal(np.asarray(gk), wk)
    np.testing.assert_array_equal(np.asarray(gv), wv)


def test_msd_descending():
    n = 70_000
    keys = datagen.random_keys(jax.random.key(6), n, "float32")
    got = _msd_sort(keys, descending=True)
    want = np_sort_oracle(np.asarray(keys), descending=True)
    assert np.array_equal(np.asarray(got).view(np.uint8), want.view(np.uint8))


def test_msd_bit_range():
    n = 70_000
    keys = datagen.random_keys(jax.random.key(7), n, "uint32")
    vals = datagen.enumerated_values(n)
    gk, gv = _msd_sort(keys, vals, begin_bit=8, end_bit=24)
    wk, wv = np_sort_oracle(np.asarray(keys), np.asarray(vals),
                            begin_bit=8, end_bit=24)
    np.testing.assert_array_equal(np.asarray(gk), wk)
    np.testing.assert_array_equal(np.asarray(gv), wv)


def test_msd_uint64_pairs():
    n = 70_000
    keys = datagen.random_keys(jax.random.key(8), n, "uint64")
    vals = datagen.enumerated_values(n)
    gk, gv = _msd_sort(keys, vals)
    wk, wv = np_sort_oracle(np.asarray(keys), np.asarray(vals))
    np.testing.assert_array_equal(np.asarray(gk), wk)
    np.testing.assert_array_equal(np.asarray(gv), wv)


def test_msd_api_dispatch():
    """algorithm='msd' through the public API (default geometry; small n
    delegates to the reference path but must stay exact)."""
    n = 50_000
    keys = datagen.random_keys(jax.random.key(9), n, "uint32")
    got = tpusort.sort(keys, algorithm="msd")
    want = np_sort_oracle(np.asarray(keys))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_msd_nonuniform_tail():
    """n far from tile multiples exercises initial-pad validity."""
    for n in (65537, 98304 + 17):
        keys = datagen.random_keys(jax.random.key(n), n, "uint32")
        got = _msd_sort(keys)
        want = np_sort_oracle(np.asarray(keys))
        np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.slow
def test_msd_pallas_interpret_keys_only():
    """Keys-only fused fast path (1-operand raw-key network, garbage
    rewritten to 0xFFFFFFFF, raw-key leaf) — interpret mode on CPU."""
    n = 23_000
    keys = datagen.random_keys(jax.random.key(12), n, "uint32")
    planes, traits = td.twiddle_in(keys)
    sp, _ = msd.sort_twiddled_msd(
        planes, (), begin_bit=0, end_bit=32, total_bits=32,
        use_pallas=True, plan_kwargs=dict(SMALL),
    )
    gk = td.twiddle_out(sp, traits, dtype=keys.dtype)
    want = np_sort_oracle(np.asarray(keys))
    np.testing.assert_array_equal(np.asarray(gk), want)


@pytest.mark.slow
def test_msd_pallas_interpret_keys_dupes():
    """Keys-only fast path under heavy duplicates incl. 0xFFFFFFFF ties with
    garbage slots (the multiset-exactness argument)."""
    n = 20_000
    k1 = datagen.entropy_keys(jax.random.key(13), n // 2, 1, "uint32")
    k2 = jnp.full((n - n // 2,), 0xFFFFFFFF, jnp.uint32)
    keys = jnp.concatenate([k1, k2])
    planes, traits = td.twiddle_in(keys)
    sp, _ = msd.sort_twiddled_msd(
        planes, (), begin_bit=0, end_bit=32, total_bits=32,
        use_pallas=True, plan_kwargs=dict(SMALL),
    )
    gk = td.twiddle_out(sp, traits, dtype=keys.dtype)
    want = np_sort_oracle(np.asarray(keys))
    np.testing.assert_array_equal(np.asarray(gk), want)


def test_msd_pallas_no_false_fallback():
    """Uniform keys must NOT trip the overflow fallback — a silently-firing
    fallback masks kernel bugs behind correct-but-slow output (regression:
    the first merge-network attempt miscompiled and hid exactly this way)."""
    n = 6_000
    keys = datagen.random_keys(jax.random.key(14), n, "uint32")
    planes, _ = td.twiddle_in(keys)
    plan = msd.plan_msd(n, 0, 32, **{k: v for k, v in SMALL.items()
                                      if k != "min_n"})
    ops = [jnp.pad(planes[0], (0, plan.m1 - n))]
    _, _, overflow = msd._run_passes_pallas(ops, 1, n, plan)
    assert not bool(overflow), "overflow fallback fired on uniform input"


@pytest.mark.slow
def test_msd_pallas_interpret():
    """The Pallas partition + leaf kernels (interpret mode on CPU) must
    produce the same exact output as the XLA path."""
    n = 24_000
    keys = datagen.random_keys(jax.random.key(11), n, "uint32")
    vals = datagen.enumerated_values(n)
    planes, traits = td.twiddle_in(keys)
    sp, sv = msd.sort_twiddled_msd(
        planes, (vals,), begin_bit=0, end_bit=32, total_bits=32,
        use_pallas=True, plan_kwargs=dict(SMALL),
    )
    gk = td.twiddle_out(sp, traits, dtype=keys.dtype)
    wk, wv = np_sort_oracle(np.asarray(keys), np.asarray(vals))
    np.testing.assert_array_equal(np.asarray(gk), wk)
    np.testing.assert_array_equal(np.asarray(sv[0]), wv)


@pytest.mark.slow
def test_msd_unstable_pairs_interpret():
    """Unstable raw-key pairs fast path: keys exact, (key, value) multiset
    preserved (reference rdxsrt_unstable_sort_pairs semantics)."""
    n = 22_000
    keys = datagen.entropy_keys(jax.random.key(15), n, 2, "uint32")
    vals = datagen.enumerated_values(n)
    planes, traits = td.twiddle_in(keys)
    sp, sv = msd.sort_twiddled_msd(
        planes, (vals,), begin_bit=0, end_bit=32, total_bits=32,
        use_pallas=True, plan_kwargs=dict(SMALL), stable=False,
    )
    gk = np.asarray(td.twiddle_out(sp, traits, dtype=keys.dtype))
    gv = np.asarray(sv[0])
    wk = np.sort(np.asarray(keys))
    np.testing.assert_array_equal(gk, wk)
    got_pairs = sorted(zip(gk.tolist(), gv.tolist()))
    want_pairs = sorted(zip(np.asarray(keys).tolist(),
                            np.asarray(vals).tolist()))
    assert got_pairs == want_pairs


@pytest.mark.slow
def test_msd_unstable_pairs_sentinel_collision():
    """Valid 0xFFFFFFFF keys + unstable pairs must take the exact fallback."""
    n = 20_000
    keys = jnp.concatenate([
        datagen.random_keys(jax.random.key(16), n - 100, "uint32"),
        jnp.full((100,), 0xFFFFFFFF, jnp.uint32),
    ])
    vals = datagen.enumerated_values(n)
    planes, traits = td.twiddle_in(keys)
    sp, sv = msd.sort_twiddled_msd(
        planes, (vals,), begin_bit=0, end_bit=32, total_bits=32,
        use_pallas=True, plan_kwargs=dict(SMALL), stable=False,
    )
    gk = np.asarray(td.twiddle_out(sp, traits, dtype=keys.dtype))
    gv = np.asarray(sv[0])
    np.testing.assert_array_equal(gk, np.sort(np.asarray(keys)))
    got_pairs = sorted(zip(gk.tolist(), gv.tolist()))
    want_pairs = sorted(zip(np.asarray(keys).tolist(),
                            np.asarray(vals).tolist()))
    assert got_pairs == want_pairs


def test_api_unstable_entry_points():
    n = 30_000
    keys = datagen.random_keys(jax.random.key(17), n, "uint32")
    vals = datagen.enumerated_values(n)
    gk, gv = tpusort.unstable_sort_pairs(keys, vals)
    got_pairs = sorted(zip(np.asarray(gk).tolist(), np.asarray(gv).tolist()))
    want_pairs = sorted(zip(np.asarray(keys).tolist(),
                            np.asarray(vals).tolist()))
    assert got_pairs == want_pairs
    gk2 = tpusort.unstable_sort_keys(keys)
    np.testing.assert_array_equal(np.asarray(gk2), np.sort(np.asarray(keys)))


@pytest.mark.slow
def test_msd_raw_u64_planes_interpret():
    """Two-plane raw fast path (lexicographic (hi, lo) comparator)."""
    n = 21_000
    hi = datagen.random_keys(jax.random.key(18), n, "uint32")
    lo = datagen.random_keys(jax.random.key(19), n, "uint32")
    sp, _ = msd.sort_twiddled_msd(
        (hi, lo), (), begin_bit=0, end_bit=64, total_bits=64,
        use_pallas=True, plan_kwargs=dict(SMALL),
    )
    got = (np.asarray(sp[0]).astype(np.uint64) << np.uint64(32)) | \
        np.asarray(sp[1]).astype(np.uint64)
    want = np.sort((np.asarray(hi).astype(np.uint64) << np.uint64(32))
                   | np.asarray(lo).astype(np.uint64))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_msd_raw_u64_pairs_unstable_interpret():
    n = 20_000
    hi = datagen.entropy_keys(jax.random.key(24), n, 2, "uint32")
    lo = datagen.entropy_keys(jax.random.key(25), n, 2, "uint32")
    vals = datagen.enumerated_values(n)
    sp, sv = msd.sort_twiddled_msd(
        (hi, lo), (vals,), begin_bit=0, end_bit=64, total_bits=64,
        use_pallas=True, plan_kwargs=dict(SMALL), stable=False,
    )
    gk = (np.asarray(sp[0]).astype(np.uint64) << np.uint64(32)) | \
        np.asarray(sp[1]).astype(np.uint64)
    kk = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | \
        np.asarray(lo).astype(np.uint64)
    np.testing.assert_array_equal(gk, np.sort(kk))
    got_pairs = sorted(zip(gk.tolist(), np.asarray(sv[0]).tolist()))
    want_pairs = sorted(zip(kk.tolist(), np.asarray(vals).tolist()))
    assert got_pairs == want_pairs


def test_msd_overflow_flag_mode():
    """on_overflow='flag': no in-graph cond; the caller owns the fallback.
    Uniform keys -> flag False and output exact; constant keys -> flag
    True (output then invalid by contract)."""
    import jax
    from tpusort import dtypes as td
    from tpusort.ops import msd as _m
    from tpusort.utils import datagen
    from oracle import np_sort_oracle
    import numpy as np

    n = 9_000  # a few SMALL-geometry tiles; min_n=1 keeps the engine engaged
    keys = datagen.random_keys(jax.random.key(5), n, "uint32")
    planes, traits = td.twiddle_in(keys)
    sp, sv, ovf = _m.sort_twiddled_msd(
        planes, (), begin_bit=0, end_bit=32, total_bits=32,
        on_overflow="flag", plan_kwargs=dict(SMALL),
    )
    assert not bool(ovf)
    got = td.twiddle_out(sp, traits, dtype=keys.dtype)
    np.testing.assert_array_equal(np.asarray(got),
                                  np_sort_oracle(np.asarray(keys)))

    const = datagen.entropy_keys(jax.random.key(6), n, 0, "uint32")
    planes_c, _ = td.twiddle_in(const)
    _, _, ovf_c = _m.sort_twiddled_msd(
        planes_c, (), begin_bit=0, end_bit=32, total_bits=32,
        on_overflow="flag", plan_kwargs=dict(SMALL),
    )
    assert bool(ovf_c)


def test_skew_tier_pairs_cond_traces():
    """skew_tier=True with payload operands must keep the lax.cond
    branches pytree-compatible (regression: the equidepth fallback branch
    returned key planes only and crashed pairs sorts at trace time)."""
    rng = np.random.default_rng(11)
    n = 20_000
    keys = rng.integers(0, 2**32, n, dtype=np.uint32)
    vals = np.arange(n, dtype=np.uint32)
    planes, traits = td.twiddle_in(jnp.asarray(keys))
    sp, sv = msd.sort_twiddled_msd(
        planes, (jnp.asarray(vals),), begin_bit=0, end_bit=32,
        total_bits=32, use_pallas=False, plan_kwargs=dict(SMALL),
        skew_tier=True, stable=True,
    )
    out = td.twiddle_out(sp, traits, descending=False, dtype=keys.dtype)
    wk, wv = np_sort_oracle(keys, vals)
    np.testing.assert_array_equal(np.asarray(out), wk)
    np.testing.assert_array_equal(np.asarray(sv[0]), wv)


@pytest.mark.slow
def test_msd_pairs_gather_apply_interpret():
    """Stable pairs with config.pairs_gather_apply: payloads skip the
    network and are applied by an XLA gather from the sorted position
    plane — output must be bit-identical to the stable oracle, including
    under heavy duplicate keys (stability via the unique position
    tiebreak)."""
    from tpusort.configs import SortConfig

    cfg = SortConfig(pairs_gather_apply=True)
    n = 22_000
    keys = datagen.entropy_keys(jax.random.key(31), n, 2, "uint32")
    vals = datagen.enumerated_values(n)
    planes, traits = td.twiddle_in(keys)
    sp, sv = msd.sort_twiddled_msd(
        planes, (vals,), begin_bit=0, end_bit=32, total_bits=32,
        use_pallas=True, plan_kwargs=dict(SMALL), config=cfg,
    )
    gk = td.twiddle_out(sp, traits, dtype=keys.dtype)
    wk, wv = np_sort_oracle(np.asarray(keys), np.asarray(vals))
    np.testing.assert_array_equal(np.asarray(gk), wk)
    np.testing.assert_array_equal(np.asarray(sv[0]), wv)


@pytest.mark.slow
def test_msd_u64_pairs_gather_apply_interpret():
    """Stable 64-bit pairs with config.pairs_gather_apply: composite
    (hi, lo, position) 3-plane raw sort + payload gather must match the
    stable oracle bit-for-bit (duplicate-heavy hi plane)."""
    from tpusort.configs import SortConfig

    cfg = SortConfig(pairs_gather_apply=True)
    n = 20_000
    hi = datagen.entropy_keys(jax.random.key(41), n, 3, "uint32")
    lo = datagen.entropy_keys(jax.random.key(42), n, 2, "uint32")
    vals = datagen.enumerated_values(n)
    sp, sv = msd.sort_twiddled_msd(
        (hi, lo), (vals,), begin_bit=0, end_bit=64, total_bits=64,
        use_pallas=True, plan_kwargs=dict(SMALL), config=cfg,
    )
    gk = (np.asarray(sp[0]).astype(np.uint64) << np.uint64(32)) | \
        np.asarray(sp[1]).astype(np.uint64)
    kk = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | \
        np.asarray(lo).astype(np.uint64)
    order = np.argsort(kk, kind="stable")
    np.testing.assert_array_equal(gk, kk[order])
    np.testing.assert_array_equal(np.asarray(sv[0]), np.asarray(vals)[order])
