"""Host-side tier pre-classifier tests (tpusort.planner).

The reference's CPU planner analog: predict, from a strided sample,
whether the radix tier's static capacities would overflow."""

import numpy as np
import pytest

from tpusort import planner
from tpusort.ops.msd import plan_msd

PLAN = plan_msd(1 << 26, 0, 32)
N = 1 << 26


def _sample(arr):
    stride = max(1, arr.size // planner.SAMPLE_TARGET)
    return arr[::stride]


def test_uniform_not_flagged():
    rng = np.random.default_rng(0)
    s = rng.integers(0, 1 << 32, planner.SAMPLE_TARGET,
                     dtype=np.int64).astype(np.uint32)
    assert not planner.predict_radix_overflow(s, PLAN, N)


def test_constant_flagged():
    s = np.full(planner.SAMPLE_TARGET, 12345, np.uint32)
    assert planner.predict_radix_overflow(s, PLAN, N)


def test_entropy_and_flagged():
    """AND of 4 uniform draws: top digits heavily biased toward 0."""
    rng = np.random.default_rng(1)
    draws = rng.integers(0, 1 << 32, (4, planner.SAMPLE_TARGET),
                         dtype=np.int64).astype(np.uint32)
    s = draws[0] & draws[1] & draws[2] & draws[3]
    assert planner.predict_radix_overflow(s, PLAN, N)


def test_zipf_flagged():
    rng = np.random.default_rng(2)
    z = rng.zipf(1.2, planner.SAMPLE_TARGET).astype(np.uint32)
    assert planner.predict_radix_overflow(z, PLAN, N)


def test_presorted_flagged_by_sortedness():
    rng = np.random.default_rng(3)
    s = np.sort(rng.integers(0, 1 << 32, planner.SAMPLE_TARGET,
                             dtype=np.int64).astype(np.uint32))
    assert planner.sortedness(s) > 0.99
    assert planner.predict_radix_overflow(s, PLAN, N)


def test_tiny_sample_never_flags():
    s = np.zeros(100, np.uint32)
    assert not planner.predict_radix_overflow(s, PLAN, N)
