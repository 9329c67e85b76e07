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


@pytest.mark.parametrize("k,run", [(384, 128), (1536, 256), (640, 128),
                                   (2560, 256)])
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
    hi = rng.integers(0, 4, (2, 512), dtype=np.uint32)   # heavy ties
    lo = rng.integers(0, 2**32, (2, 512), dtype=np.uint32)
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
    T, K, q = 4, 1024, 128
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
    T, K, R, S = 2, 2048, 8, 384
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


def test_partition_starts_rows_matches_default():
    """Row-hierarchical starts (digit monotone in a key-sorted tile) must
    be bit-identical to the full-tile compare-reduce starts."""
    import numpy as np
    from tpusort.kernels.partition import partition_pass_fused

    rng = np.random.default_rng(5)
    T, K, r, s = 8, 2048, 8, 384
    for nplanes in (1, 2):
        planes = [
            jnp.asarray(rng.integers(0, 1 << 32, (T, K), dtype=np.int64)
                        .astype(np.uint32))
            for _ in range(nplanes)
        ]
        n = T * K - 777
        a, ca = partition_pass_fused(
            planes, [], None, r=r, s=s, lo_bit=32 * nplanes - 3, width=3,
            n=n, t_seg=T, interpret=True)
        b, cb = partition_pass_fused(
            planes, [], None, r=r, s=s, lo_bit=32 * nplanes - 3, width=3,
            n=n, t_seg=T, starts_rows=True, interpret=True)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


def test_sort_tiles_counts_collapsed_dense():
    """Fused leaf+collapse: dense output equals sort-then-compact, across
    ragged counts, multiple ops, and batch-spanning offsets."""
    import jax
    import jax.numpy as jnp
    from tpusort.kernels.bitonic import sort_tiles_counts_collapsed

    rng = np.random.default_rng(13)
    T, K, q = 8, 1024, 128
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


@pytest.mark.parametrize("t_seg", [None, 4])
def test_partition_gather_apply_matches_general(t_seg):
    """The gather-apply pass (1-operand sortkey network + composed
    take_along_axis emit) must agree with the general stable path on every
    valid slot and on counts, in both tile-major and fused-exchange
    layouts (pad slots are free garbage in both)."""
    rng = np.random.default_rng(7)
    T, K, r, s = 8, 1024, 8, 256
    n = T * K - 137
    keys = jnp.asarray(
        rng.integers(0, 1 << 32, (T, K), dtype=np.int64).astype(np.uint32))
    vals = jnp.asarray(
        rng.integers(0, 1 << 32, (T, K), dtype=np.int64).astype(np.uint32))
    kw = dict(r=r, s=s, lo_bit=29, width=3, n=n, t_seg=t_seg, interpret=True)
    d0, c0 = partition_pass_fused([keys], [vals], None, **kw)
    d1, c1 = partition_pass_fused([keys], [vals], None, gather_apply=True,
                                  **kw)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    c = np.asarray(c0)
    for a, b in zip(d0, d1):
        if t_seg is None:
            A = np.asarray(a).reshape(T, r, s)
            B = np.asarray(b).reshape(T, r, s)
            for t in range(T):
                for d in range(r):
                    np.testing.assert_array_equal(
                        A[t, d, : c[t, d]], B[t, d, : c[t, d]])
        else:
            A = np.asarray(a).reshape(T // t_seg, r, t_seg, s)
            B = np.asarray(b).reshape(T // t_seg, r, t_seg, s)
            for seg in range(T // t_seg):
                for d in range(r):
                    for j in range(t_seg):
                        cc = c[seg * t_seg + j, d]
                        np.testing.assert_array_equal(
                            A[seg, d, j, :cc], B[seg, d, j, :cc])


def test_partition_gather_apply_counts_chain():
    """gather_apply with counts-chain validity (q_in subruns)."""
    rng = np.random.default_rng(8)
    T, K, r, s, q = 4, 1024, 8, 256, 256
    keys = jnp.asarray(
        rng.integers(0, 1 << 32, (T, K), dtype=np.int64).astype(np.uint32))
    cin = np.full((T, K // q), q, np.int32)
    cin[:, -1] = 77
    kw = dict(r=r, s=s, lo_bit=29, width=3, q_in=q, interpret=True)
    d0, c0 = partition_pass_fused([keys], [], jnp.asarray(cin), **kw)
    d1, c1 = partition_pass_fused([keys], [], jnp.asarray(cin),
                                  gather_apply=True, **kw)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    c = np.asarray(c0)
    A = np.asarray(d0[0]).reshape(T, r, s)
    B = np.asarray(d1[0]).reshape(T, r, s)
    for t in range(T):
        for d in range(r):
            # keys-only: the raw-key path emits runs key-sorted, the gather
            # path emits them in stable input order — compare multisets
            np.testing.assert_array_equal(
                np.sort(A[t, d, : c[t, d]]), np.sort(B[t, d, : c[t, d]]))


@pytest.mark.parametrize("c", [pytest.param(256, marks=pytest.mark.slow),
                               2048])
@pytest.mark.parametrize("t_seg", [pytest.param(None,
                                                marks=pytest.mark.slow), 4])
def test_partition_u16_matches_general(c, t_seg):
    """The u16-subtile sortkey pass must agree with the general stable
    path exactly on every valid slot and on counts (within-digit order is
    (subtile, idx) = original tile position on both sides)."""
    from tpusort.kernels.partition import partition_pass_u16

    rng = np.random.default_rng(11)
    T, K, r, s = 8, 2048, 8, 512
    n = T * K - 137
    keys = jnp.asarray(
        rng.integers(0, 1 << 32, (T, K), dtype=np.int64).astype(np.uint32))
    vals = jnp.asarray(
        rng.integers(0, 1 << 32, (T, K), dtype=np.int64).astype(np.uint32))
    kw = dict(r=r, s=s, lo_bit=29, width=3, n=n, t_seg=t_seg, interpret=True)
    d0, c0 = partition_pass_fused([keys], [vals], None, **kw)
    d1, c1 = partition_pass_u16([keys], [vals], None, c=c, **kw)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    cc = np.asarray(c0)
    for a, b in zip(d0, d1):
        if t_seg is None:
            A = np.asarray(a).reshape(T, r, s)
            B = np.asarray(b).reshape(T, r, s)
            for t in range(T):
                for d in range(r):
                    np.testing.assert_array_equal(
                        A[t, d, : cc[t, d]], B[t, d, : cc[t, d]])
        else:
            A = np.asarray(a).reshape(T // t_seg, r, t_seg, s)
            B = np.asarray(b).reshape(T // t_seg, r, t_seg, s)
            for seg in range(T // t_seg):
                for d in range(r):
                    for j in range(t_seg):
                        q = cc[seg * t_seg + j, d]
                        np.testing.assert_array_equal(
                            A[seg, d, j, :q], B[seg, d, j, :q])


def test_partition_u16_counts_chain_and_constraint():
    from tpusort.kernels.partition import partition_pass_u16

    rng = np.random.default_rng(12)
    T, K, r, s, q = 4, 2048, 8, 512, 256
    keys = jnp.asarray(
        rng.integers(0, 1 << 32, (T, K), dtype=np.int64).astype(np.uint32))
    cin = np.full((T, K // q), q, np.int32)
    cin[:, -1] = 77
    kw = dict(r=r, s=s, lo_bit=29, width=3, q_in=q, interpret=True)
    d0, c0 = partition_pass_fused([keys], [], jnp.asarray(cin), **kw)
    d1, c1 = partition_pass_u16([keys], [], jnp.asarray(cin), c=1024, **kw)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    cc = np.asarray(c0)
    A = np.asarray(d0[0]).reshape(T, r, s)
    B = np.asarray(d1[0]).reshape(T, r, s)
    for t in range(T):
        for d in range(r):
            np.testing.assert_array_equal(
                np.sort(A[t, d, : cc[t, d]]), np.sort(B[t, d, : cc[t, d]]))
    # u16 capacity constraint: (r+1)*C must fit the 16-bit sortkey
    with pytest.raises(ValueError):
        partition_pass_u16([keys], [], None, r=63, s=s, lo_bit=26, width=6,
                           n=T * K, c=2048, interpret=True)
