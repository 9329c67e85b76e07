"""Kernel-level unit tests (Pallas interpret mode).

Pin the network/kernel primitives directly — the engine tests exercise them
end-to-end, but these isolate regressions to a specific primitive: the
bitonic sort network, merge-from-sorted-runs entry, the XOR-decomposed
block reversal, the staged f*2^a merge (f in {3,5}), the counts-table leaf,
and the fused partition pass's counts output.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusort.kernels import bitonic as kb
from tpusort.kernels.partition import partition_pass_fused

LANES = kb.LANES


def _run_net(fn_body, ops, nb=1):
    """Run a network body over (T, K) operands in interpret mode."""
    T, K = ops[0].shape
    rows = K // LANES
    n = len(ops)

    def kern(*refs):
        ins, outs = refs[:n], refs[n:]
        arrays = fn_body([r[...] for r in ins])
        for o, a in zip(outs, arrays):
            o[...] = a

    spec = pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((T, rows, LANES), o.dtype)
                   for o in ops],
        grid=(T // nb,), in_specs=[spec] * n, out_specs=[spec] * n,
        interpret=True,
    )(*[o.reshape(T, rows, LANES) for o in ops])
    return [o.reshape(T, K) for o in out]


def test_sort_network_exact():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**32, (4, 1024), dtype=np.uint32)
    (got,) = _run_net(lambda a: kb._sort_network(a), [jnp.asarray(x)])
    np.testing.assert_array_equal(np.asarray(got), np.sort(x, axis=1))


def test_reverse_within():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2**32, (2, 1024), dtype=np.uint32)
    (got,) = _run_net(lambda a: [kb._reverse_within(a[0], 256)],
                      [jnp.asarray(x)])
    want = x.reshape(2, 4, 256)[:, :, ::-1].reshape(2, 1024)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("run", [128, 256, 512])
def test_merge_sorted_runs(run):
    rng = np.random.default_rng(run)
    x = rng.integers(0, 2**32, (3, 2048), dtype=np.uint32)
    x = np.sort(x.reshape(3, 2048 // run, run), axis=2).reshape(3, 2048)
    (got,) = _run_net(lambda a: kb._merge_sorted_runs(a, run),
                      [jnp.asarray(x)])
    np.testing.assert_array_equal(np.asarray(got), np.sort(x, axis=1))


@pytest.mark.parametrize("k,run", [
    (384, 128), (640, 128), (1536, 256), (3072, 256), (5120, 512),
    # production s1 geometry: heaviest interpret-mode network, slow set
    pytest.param(2560, 256, marks=pytest.mark.slow),
    # blk = 2^14 engages the per-block column-major layout (S=128)
    pytest.param(49152, 512, marks=pytest.mark.slow),
])
def test_staged_fpow2_merge(k, run):
    assert kb.merge_staged_factor(k) in (3, 5)
    rng = np.random.default_rng(k)
    x = rng.integers(0, 2**32, (2, k), dtype=np.uint32)
    x = np.sort(x.reshape(2, k // run, run), axis=2).reshape(2, k)
    (got,) = _run_net(
        lambda a: kb._merge_sorted_runs_fpow2(a, run), [jnp.asarray(x)]
    )
    np.testing.assert_array_equal(np.asarray(got), np.sort(x, axis=1))


def test_two_key_lexicographic_network():
    rng = np.random.default_rng(4)
    hi = rng.integers(0, 4, (2, 256), dtype=np.uint32)   # heavy ties
    lo = rng.integers(0, 2**32, (2, 256), dtype=np.uint32)
    got = _run_net(lambda a: kb._sort_network(a, num_keys=2),
                   [jnp.asarray(hi), jnp.asarray(lo)])
    comp = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    want = np.sort(comp, axis=1)
    gc = (np.asarray(got[0]).astype(np.uint64) << np.uint64(32)) | \
        np.asarray(got[1]).astype(np.uint64)
    np.testing.assert_array_equal(gc, want)


def test_sort_tiles_counts_validity():
    """Counts-table leaf: garbage slots excluded, valid prefix sorted."""
    rng = np.random.default_rng(5)
    T, K, q = 2, 512, 128
    x = rng.integers(0, 2**32 - 1, (T, K), dtype=np.uint32)
    counts = rng.integers(0, q + 1, (T, K // q), dtype=np.int32)
    got = kb.sort_tiles_counts(jnp.asarray(x), jnp.asarray(counts), q,
                               interpret=True)
    got = np.asarray(got)
    for t in range(T):
        valid = np.concatenate([
            x[t, i * q : i * q + counts[t, i]] for i in range(K // q)
        ])
        np.testing.assert_array_equal(got[t, : valid.size], np.sort(valid))
        assert np.all(got[t, valid.size:] == 0xFFFFFFFF)


def test_partition_pass_counts_and_runs():
    """Fused pass: counts must equal the per-(tile, digit) histogram and
    each emitted run must hold that digit's keys sorted."""
    rng = np.random.default_rng(6)
    T, K, R, S = 2, 512, 8, 256
    x = rng.integers(0, 2**32 - 1, (T, K), dtype=np.uint32)
    n = T * K - 333
    data, counts = partition_pass_fused(
        [jnp.asarray(x.reshape(-1)).reshape(T, K)], [], None,
        r=R, s=S, lo_bit=29, width=3, n=n, interpret=True,
    )
    counts = np.asarray(counts)
    flat = x.reshape(-1)[:n]
    out = np.asarray(data[0]).reshape(T, R, S)
    for t in range(T):
        tile = flat[t * K : (t + 1) * K]
        for d in range(R):
            want = np.sort(tile[(tile >> 29) == d])
            assert counts[t, d] == want.size
            np.testing.assert_array_equal(out[t, d, : want.size], want)


def test_sort_tiles_counts_collapsed_dense():
    """Fused leaf+collapse: dense output equals sort-then-compact, across
    ragged counts, multiple ops, and batch-spanning offsets."""
    import jax
    import jax.numpy as jnp
    from tpusort.kernels.bitonic import sort_tiles_counts_collapsed

    rng = np.random.default_rng(13)
    T, K, q = 2, 256, 128
    keys = rng.integers(0, 1 << 32, (T, K), dtype=np.uint64).astype(np.uint32)
    vals = rng.integers(0, 1 << 32, (T, K), dtype=np.uint64).astype(np.uint32)
    counts = rng.integers(0, q + 1, (T, K // q)).astype(np.int32)
    n_out = int(counts.sum())
    got_k, got_v = sort_tiles_counts_collapsed(
        [jnp.asarray(keys), jnp.asarray(vals)], jnp.asarray(counts), q,
        n_out, num_keys=1, interpret=True)
    # oracle: per tile, keep valid prefixes of each subrun, sort by key
    # (garbage removed), concatenate tiles in order
    wk, wv = [], []
    for t in range(T):
        mask = np.zeros(K, bool)
        for s in range(K // q):
            mask[s * q : s * q + counts[t, s]] = True
        kk, vv = keys[t][mask], vals[t][mask]
        order = np.argsort(kk, kind="stable")
        wk.append(kk[order]); wv.append(vv[order])
    wk, wv = np.concatenate(wk), np.concatenate(wv)
    np.testing.assert_array_equal(np.asarray(got_k), wk)
    # values: permutation within equal keys is free — compare (key,value)
    # multisets per tile span
    got_pairs = np.stack([np.asarray(got_k), np.asarray(got_v)], 1)
    want_pairs = np.stack([wk, wv], 1)
    o1 = np.lexsort(got_pairs.T); o2 = np.lexsort(want_pairs.T)
    np.testing.assert_array_equal(got_pairs[o1], want_pairs[o2])




@pytest.mark.parametrize("n_data", [1, 2])
def test_collapse_segments_chunked(monkeypatch, n_data):
    """Chunked collapse (segrows > VMEM budget): big segments stream
    through a fixed-size window; clamped-overlap tail chunks and empty
    segments must still produce the exact dense concatenation.  Guards
    the r3 distributed-finish OOM fix (scratch was sized group*segrows)."""
    from tpusort.kernels import collapse as kc

    rng = np.random.default_rng(7)
    nseg, segrows = 5, 10            # seg = 1280 elements
    seg = segrows * LANES
    # budget floors at 8 rows -> f=8, nch=2, tail chunk clamped (coff=2)
    monkeypatch.setattr(kc, "_VMEM_BUDGET", 3 * LANES * 4)
    assert max(8, (3 * LANES * 4) // (LANES * 4)) < segrows, \
        "test must exercise the chunked path"
    ops = [
        rng.integers(0, 1 << 32, (nseg, seg), dtype=np.uint64)
        .astype(np.uint32)
        for _ in range(n_data)
    ]
    counts = np.array([seg, 0, 517, 1, 1280 - 129], np.int32)
    full = int(counts.sum())
    # the documented contract allows sum(seg_counts) > n_out: trailing
    # chunks past n_out must be dropped, not written out of bounds
    for n_out in (full, full - 700):
        got = kc.collapse_segments(
            [jnp.asarray(o) for o in ops], jnp.asarray(counts), n_out,
            interpret=True)
        for o, g in zip(ops, got):
            want = np.concatenate(
                [o[s, :counts[s]] for s in range(nseg)])[:n_out]
            np.testing.assert_array_equal(np.asarray(g), want)


def test_collapse_segments_group_budget(monkeypatch):
    """Grouped collapse must shrink the group to fit the VMEM budget."""
    from tpusort.kernels import collapse as kc

    rng = np.random.default_rng(8)
    nseg, segrows = 8, 2
    seg = segrows * LANES
    # budget floors at 8 rows: group 8 x 2 rows > 8 -> shrinks to 4
    monkeypatch.setattr(kc, "_VMEM_BUDGET", 4 * LANES * 4)
    ops = [rng.integers(0, 1 << 32, (nseg, seg), dtype=np.uint64)
           .astype(np.uint32)]
    counts = rng.integers(0, seg + 1, (nseg,)).astype(np.int32)
    n_out = int(counts.sum())
    got = kc.collapse_segments(
        [jnp.asarray(ops[0])], jnp.asarray(counts), max(n_out, 1),
        interpret=True)
    want = np.concatenate([ops[0][s, :counts[s]] for s in range(nseg)])
    np.testing.assert_array_equal(np.asarray(got[0])[:n_out], want)


@pytest.mark.parametrize("k,run", [(384, 128), (640, 128)])
def test_staged_fpow2_merge_multikey_payload(k, run):
    """Cascade back-insertion with lexicographic keys + payload: heavy
    hi-plane ties exercise the directed-merge multi-key fold; the payload
    must stay bound to its (hi, lo) key through every select."""
    rng = np.random.default_rng(1000 + k)
    hi = rng.integers(0, 3, (2, k), dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, (2, k), dtype=np.uint64).astype(np.uint32)
    # per-run lexicographic pre-sort
    comp = (hi.astype(np.uint64) << np.uint64(32)) | lo
    comp = np.sort(comp.reshape(2, k // run, run), axis=2).reshape(2, k)
    hi_s = (comp >> np.uint64(32)).astype(np.uint32)
    lo_s = (comp & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    pay = lo_s ^ np.uint32(0xABCD1234)          # payload derivable from key
    got = _run_net(
        lambda a: kb._merge_sorted_runs_fpow2(a, run, num_keys=2),
        [jnp.asarray(hi_s), jnp.asarray(lo_s), jnp.asarray(pay)],
    )
    want = np.sort(comp, axis=1)
    gc = (np.asarray(got[0]).astype(np.uint64) << np.uint64(32)) | \
        np.asarray(got[1]).astype(np.uint64)
    np.testing.assert_array_equal(gc, want)
    # payload binding: pay == lo ^ const must hold slot-wise after the sort
    np.testing.assert_array_equal(
        np.asarray(got[2]), np.asarray(got[1]) ^ np.uint32(0xABCD1234))
