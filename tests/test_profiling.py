"""Profiling harness tests (M-11 analog): tables, CSV, per-pass arrays."""

import numpy as np

from tpusort.utils.profiling import Profile


def test_profile_table_and_csv():
    p = Profile("demo")
    for i in range(3):
        with p.run(num_keys=1000 * (i + 1), entropy=i) as r:
            r.set_metric("sort_ms", 1.5 * (i + 1))
            r.push("partition_ms", 0.5 * (i + 1))
            r.push("partition_ms", 0.25 * (i + 1))
    t = p.table()
    assert "demo" in t and "sort_ms" in t and "partition_ms[1]" in t
    assert "(min)" in t and "(avg)" in t
    c = p.csv().splitlines()
    assert c[0].startswith("num_keys,entropy,sort_ms")
    assert len(c) == 4
    j = p.json_lines().splitlines()
    assert len(j) == 3


def test_profile_empty():
    p = Profile("empty")
    assert "empty" in p.table()
    assert p.csv().strip() == ""


def test_profile_msd_phases_cpu():
    """Per-phase profiler drives the real engine helpers (regression: the
    leaf phase once called msd._leaf_sort with a stale argument list and
    crashed before emitting leaf_ms/collapse_ms)."""
    from tpusort.utils.profiling import profile_msd_phases

    p = profile_msd_phases(1 << 14, fused_total=False)
    assert len(p.runs) == 1
    m = p.runs[0]
    assert m.metrics["leaf_ms"] > 0 and m.metrics["collapse_ms"] > 0
    assert len(m.arrays.get("partition_ms", [])) >= 1
