"""Distributed multi-chip / multi-host global sort.

The reference is single-device (SURVEY.md §2.3); this supplies the
north-star capability (BASELINE.json config #5): keys range-partitioned via
splitters, redistributed by an all-to-all shuffle, locally sorted — globally
sorted by construction.

TPU-native design decisions (static shapes, XLA collectives over ICI):

* **Exact splitters, not sampled.** Output shards must be STATIC-shape
  (N/D per device), so splitters are exact global order statistics,
  computed by a bitwise distributed selection: one count + ``psum`` round
  per key bit (32 per plane) — no data movement.  64-bit keys run the
  same selection over (hi, lo) planes with lexicographic prefix matching.
* **Skew-proof tie quotas.** Elements equal to a splitter are split across
  devices by their global tie rank (destination = (below + tie_rank) //
  shard), so even a single repeated value load-balances exactly — stronger
  than the reference's hot-bucket handling (cuda_radix_sort.h:437-447).
* **Chunked padded all-to-all.** Each device sends its bucket-d run padded
  to a fixed capacity C, split into ``chunks`` independent
  ``jax.lax.all_to_all`` pieces along the capacity axis; each piece
  depends only on its own slice of the send expansion, so XLA can overlap
  piece k's transfer with piece k+1's slicing (and a Pallas remote-DMA
  ring can replace the collective without changing the dataflow).  Pair
  counts above C (pathologically pre-ordered inputs with small capacity)
  are detected and the sort falls back to an allgather + local sort via
  ``lax.cond``; with ``adaptive=True`` the overflow flag is also synced
  host-side and the geometry's capacity factor doubles for subsequent
  calls (the distributed analog of the single-chip host-owned
  ``on_overflow="flag"`` tier chain).
* **Engine-finished shards.** The post-shuffle finish runs the single-chip
  msd engine (raw-key networks), not ``lax.sort``: keys-only garbage is
  rewritten to the all-ones sentinel (multiset-exact); pairs ride a
  composite (validity, key) 2-plane raw sort whose validity plane can
  never tie the sentinel.
* Validity is positional (slot s of a received run is garbage iff
  s >= count), the same convention as the single-chip MSD engine.

Scope: u32/i32/f32 single-plane dtypes and 2-plane 64-bit keys (via
``make_global_sort_planes`` on TPU, or 64-bit dtypes where the backend
materializes them); 32-bit payloads.  Pairs sort unstably across hosts
(keys bit-exact; pair equivalence is permutation-level, matching the
reference's own unstable-pair test semantics, test_sort_pairs.cu:81-113).
Pairs with 2-plane keys finish with the variadic XLA sort (the raw network
carries at most 2 key planes).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusort import dtypes as _dtypes

__all__ = ["global_sort", "make_global_sort", "make_global_sort_planes"]


def _lex_lt_eq(plane_vals: Sequence[jax.Array], words: Sequence[jax.Array]):
    """Elementwise (v <lex w, v ==lex w) for multi-word values."""
    lt = None
    eq = None
    for a, s in zip(plane_vals, words):
        lt_i = a < s
        eq_i = a == s
        if lt is None:
            lt, eq = lt_i, eq_i
        else:
            lt = lt | (eq & lt_i)
            eq = eq & eq_i
    return lt, eq


def _select_splitters(
    planes: Sequence[jax.Array], n_shard: int, d: int, axis: str
):
    """Exact order statistics at ranks b*n_shard (b=1..D-1) of the global
    twiddled key multiset, plus the strictly-below counts.

    Bitwise radix selection, one plane at a time (most-significant first):
    within a plane, 32 rounds of count+psum refine all boundaries in
    parallel; finished planes constrain deeper rounds through an exact
    equality match mask.  Returns (splitter planes [(D-1,) uint32 ...],
    below (D-1,) uint32).

    Global counts (``below``, ``c0``, ``ranks``) are uint32: they range up
    to the GLOBAL n-1, which exceeds int32 beyond 2^31 total keys, and this
    backend cannot materialize 64-bit arrays.  uint32 carries the
    reference's own single-device ceiling (2^32-1 keys,
    ``msb/src/sort/gpu_radix_sort.h:190`` ``IndexT = unsigned int``) to the
    distributed total.  ``ranks - below`` stays non-negative by
    construction (below only grows while staying <= rank), so the unsigned
    compare is exact.
    """
    nb = d - 1
    ranks = (jnp.arange(1, d, dtype=jnp.uint32)) * jnp.uint32(n_shard)
    n = planes[0].shape[0]
    below = jnp.zeros((nb,), jnp.uint32)
    match = jnp.ones((n, nb), bool)
    prefixes: List[jax.Array] = []
    for pw in planes:
        def round_(i, state, pw=pw, match=match):
            prefix, below = state
            bit = 31 - i
            cand0 = prefix << jnp.uint32(1)
            shifted = pw >> jnp.uint32(bit)
            local = (
                (shifted[:, None] == cand0[None, :]) & match
            ).sum(0, dtype=jnp.uint32)
            c0 = jax.lax.psum(local, axis)
            choose0 = (ranks - below) < c0
            prefix = jnp.where(choose0, cand0, cand0 + jnp.uint32(1))
            below = jnp.where(choose0, below, below + c0)
            return prefix, below

        prefix, below = jax.lax.fori_loop(
            0, 32, round_, (jnp.zeros((nb,), jnp.uint32), below)
        )
        prefixes.append(prefix)
        match = match & (pw[:, None] == prefix[None, :])
    return prefixes, below


def _destinations_sorted(
    planes_s: Sequence[jax.Array],
    splitters: Sequence[jax.Array],
    below: jax.Array,
    n_shard: int,
    d: int,
    axis: str,
):
    """Bucket starts/counts for a LOCALLY SORTED shard (exact tie quotas).

    Sorting first makes every tie run contiguous: rank-within-value is
    position minus run start (one cummax scan), destinations are monotone
    by construction, and the per-splitter comparisons are O(n * (d-1))
    vectorized lexicographic compares.  An element ties at most one
    splitter GROUP (equal splitters share a value; ``tie_idx = gt`` points
    at the group's first slot, and ``below + global tie rank`` spreads the
    group's value across its full span of shards).
    """
    nb = d - 1
    r = jax.lax.axis_index(axis)
    n = planes_s[0].shape[0]

    gt = jnp.zeros((n,), jnp.int32)   # #(splitter <lex v)
    ge = jnp.zeros((n,), jnp.int32)   # #(splitter <=lex v)
    eq_counts = []                    # per-splitter local tie counts
    for b in range(nb):
        words = [sp[b] for sp in splitters]
        s_lt_v, s_eq_v = _lex_lt_eq(
            [jnp.full((n,), w, jnp.uint32) for w in words],
            planes_s,
        )
        gt = gt + s_lt_v.astype(jnp.int32)
        ge = ge + (s_lt_v | s_eq_v).astype(jnp.int32)
        eq_counts.append(s_eq_v.sum(dtype=jnp.int32))
    is_tie = ge > gt
    tie_idx = jnp.clip(gt, 0, nb - 1)

    # local tie counts per splitter group (stored at the group's first slot)
    first_of_group = jnp.concatenate([
        jnp.ones((1,), bool),
        functools.reduce(
            jnp.logical_or,
            [sp[1:] != sp[:-1] for sp in splitters],
        ),
    ]) if len(splitters[0]) > 1 else jnp.ones((nb,), bool)
    t_local = jnp.where(first_of_group, jnp.stack(eq_counts), 0)
    t_all = jax.lax.all_gather(t_local, axis)                # (D, nb)
    # global tie counts below this shard sum across devices -> uint32 (the
    # global total can exceed int32; see _select_splitters)
    p_r = jnp.where(
        (jnp.arange(d) < r)[:, None], t_all, 0
    ).sum(0, dtype=jnp.uint32)                               # (nb,)

    idx = jnp.arange(n, dtype=jnp.int32)
    neq = functools.reduce(
        jnp.logical_or, [p_[1:] != p_[:-1] for p_ in planes_s]
    )
    neq = jnp.concatenate([jnp.ones((1,), bool), neq])
    run_start = jax.lax.cummax(jnp.where(neq, idx, 0))
    j = idx - run_start                                      # tie rank

    dest_tie = (
        (below[tie_idx] + p_r[tie_idx] + j.astype(jnp.uint32))
        // jnp.uint32(n_shard)
    ).astype(jnp.int32)
    dest = jnp.clip(jnp.where(is_tie, dest_tie, gt), 0, d - 1)
    starts = jnp.searchsorted(dest, jnp.arange(d), side="left").astype(
        jnp.int32
    )
    counts = jnp.concatenate(
        [starts[1:], jnp.asarray([n], jnp.int32)]
    ) - starts
    return starts, counts


def _local_engine_sort(planes, values, total_bits, stable=False):
    from tpusort.ops.msd import sort_twiddled_msd

    return sort_twiddled_msd(
        tuple(planes), tuple(values), begin_bit=0, end_bit=total_bits,
        total_bits=total_bits, stable=stable, skew_tier=False,
    )


def _global_sort_shard(
    ops: Sequence[jax.Array],
    nplanes: int,
    n_shard: int,
    d: int,
    axis: str,
    capacity: int,
    chunks: int,
    return_overflow: bool = False,
    finish_mode: str = "auto",
    finish_plan_kwargs: Optional[dict] = None,
    exchange: str = "collective",
):
    """Per-shard body (runs under shard_map). ops = planes + values, u32."""
    planes = list(ops[:nplanes])
    values = list(ops[nplanes:])
    splitters, below = _select_splitters(planes, n_shard, d, axis)

    # local sort BY KEY first (the engine's cheapest path), so splitter
    # buckets are contiguous runs and tie ranks are positional.  Pairs ride
    # the unstable raw path (global pair semantics are unstable anyway; the
    # engine pre-checks its 0xFFFFFFFF sentinel).
    sp, sv = _local_engine_sort(planes, values, 32 * nplanes)
    planes_s = list(sp)
    sorted_ops = planes_s + list(sv)
    starts, counts = _destinations_sorted(
        planes_s, splitters, below, n_shard, d, axis
    )

    # padded-run expansion via d contiguous dynamic slices (a flat gather
    # here costs ~30x HBM bandwidth on TPU; slices are plain copies),
    # CHUNKED along the capacity axis: piece j's all_to_all depends only on
    # piece j's slices, so transfers overlap the remaining slicing work
    # (SURVEY §7 step 5).  The capacity tail pad keeps every slice
    # in-bounds so runs stay at the front of their window (positional
    # validity on the receive side).
    cap_c = capacity // chunks
    padded = [
        jnp.concatenate([o, jnp.zeros((capacity,), o.dtype)])
        for o in sorted_ops
    ]

    def _expand_piece(opad, j):
        return jnp.stack([
            jax.lax.dynamic_slice_in_dim(
                opad, starts[b] + j * cap_c, cap_c
            )
            for b in range(d)
        ])

    if exchange == "rdma":
        # Pallas direct remote-DMA exchange (parallel/ring.py): one
        # kernel issues all D-1 peer transfers concurrently over ICI —
        # no XLA collective, issue/wait split by construction
        from tpusort.parallel.ring import ring_all_to_all

        recv = []
        for opad in padded:
            send = jnp.concatenate(
                [_expand_piece(opad, j) for j in range(chunks)], axis=1
            )
            recv.append(ring_all_to_all(send, axis, d=d))
    else:
        recv_pieces: List[List[jax.Array]] = []
        for j in range(chunks):
            send_j = [_expand_piece(opad, j) for opad in padded]
            recv_pieces.append([
                jax.lax.all_to_all(s, axis, split_axis=0, concat_axis=0,
                                   tiled=True)
                for s in send_j
            ])
        recv = [
            jnp.concatenate([rp[i] for rp in recv_pieces], axis=1)
            for i in range(len(sorted_ops))
        ]
    cmat = jax.lax.all_gather(counts, axis)                  # (D src, D dst)
    r = jax.lax.axis_index(axis)
    recv_counts = cmat[:, r]                                  # (D,)
    overflow = jax.lax.pmax(jnp.max(cmat), axis) > capacity

    # The received layout — d runs of ``capacity`` with valid prefix
    # lengths — is exactly the collapse kernel's input: compact the valid
    # prefixes in order (each shard receives exactly n_shard valid
    # elements by splitter construction), then finish with the engine's
    # raw-key networks on a clean dense array.  Sorting the padded buffer
    # directly would feed the radix engine a sentinel-dominated top digit
    # (~(1 - 1/capacity_factor) of all slots), a guaranteed capacity
    # overflow that forced its fallback on every call.
    from tpusort.kernels.collapse import collapse_segments

    def _norm_params():
        # range normalization: shard r's keys lie in
        # [splitter[r-1], splitter[r]] — a narrow VALUE range whose top
        # bits are nearly constant, which would concentrate the engine's
        # static MSD digits into a handful of runs and force the slow
        # in-graph fallback at production shard widths.
        # (k - base) << clz(width) is a monotone bijection of the shard's
        # range onto a full-width domain, so the engine runs its fast
        # path on ANY split; the map is undone after the sort (low bits
        # shift in as zeros, exactly recoverable).
        spl = splitters[0]
        base = jnp.where(r > 0, spl[jnp.maximum(r - 1, 0)],
                         jnp.uint32(0))
        hi_s = jnp.where(r < d - 1, spl[jnp.minimum(r, d - 2)],
                         jnp.uint32(0xFFFFFFFF))
        width = jnp.maximum(hi_s - base, jnp.uint32(1))
        sh = jnp.minimum(
            jax.lax.clz(width).astype(jnp.uint32), jnp.uint32(31)
        )
        return base, sh

    def _finish_windows(seg_counts):
        """Sorted-window finish (DESIGN.md r5): the received runs are
        monotone slices of locally SORTED shards, so they feed the engine
        pipeline directly — the window counts seed the validity chain,
        pass 0 is emit-only, and the collapse disappears (the fused
        leaf+collapse emits the dense shard).  Returns the finished ops
        list, or None when the geometry admits no windows plan."""
        from tpusort.ops.msd import sort_windows_msd

        base, sh = _norm_params()
        kn = ((recv[0] - base) << sh).reshape(-1)
        res = sort_windows_msd(
            (kn,), tuple(x.reshape(-1) for x in recv[1:]),
            window_counts=seg_counts, window=capacity, n=n_shard,
            total_bits=32, plan_kwargs=finish_plan_kwargs,
        )
        if res is None:
            return None
        ops2, ovf2 = res
        if len(recv) > 1:
            # pairs ride the raw path: a VALID normalized key equal to the
            # garbage sentinel could swap payloads with a pad slot — same
            # pre-check as the single-chip raw pairs path
            pos_in = jnp.arange(d * capacity, dtype=jnp.int32) % capacity
            vmask = pos_in < jnp.repeat(seg_counts, capacity)
            ovf2 = ovf2 | jnp.any(
                vmask & (kn == jnp.uint32(0xFFFFFFFF))
            )

        def _exact(_):
            # windows-skew fallback: compact and run the exact sort
            compacted = collapse_segments(
                [x.reshape(d, capacity) for x in recv], seg_counts,
                n_shard,
            )
            srt = jax.lax.sort(compacted, num_keys=nplanes)
            return list(srt)

        def _ok(_):
            return [(ops2[0] >> sh) + base] + list(ops2[1:])

        return jax.lax.cond(ovf2, _exact, _ok, None)

    def finish(_):
        # the finish lives INSIDE the cond so the overflow path does not
        # pay for the main pipeline's expensive tail on top of the
        # allgather fallback (the shuffle above already happened; only
        # its bytes are sunk).  ``overflow`` is pmax-uniform across the
        # axis, so branch divergence cannot deadlock the fallback's
        # all_gather.
        seg_counts = jnp.minimum(recv_counts, jnp.int32(capacity))
        if finish_mode != "collapse" and nplanes == 1 and d > 1:
            out_w = _finish_windows(seg_counts)
            if out_w is not None:
                return out_w
            if finish_mode == "windows":
                raise ValueError(
                    f"no sorted-window finish plan for capacity={capacity}"
                    f" (needs capacity % tile == 0 and a feasible t1)"
                )
        compacted = collapse_segments(
            [x.reshape(d, capacity) for x in recv], seg_counts, n_shard
        )
        if nplanes == 1 and d > 1:
            base, sh = _norm_params()
            kn = (compacted[0] - base) << sh
            sp2, sv2 = _local_engine_sort([kn], compacted[1:], 32)
            k_out = (sp2[0] >> sh) + base
            return [k_out] + list(sv2)
        sp2, sv2 = _local_engine_sort(
            compacted[:nplanes], compacted[nplanes:], 32 * nplanes
        )
        return list(sp2) + list(sv2)

    def fallback(_):
        # allgather everything, sort locally, take the owned range
        full = [jax.lax.all_gather(o, axis).reshape(-1) for o in ops]
        srt = jax.lax.sort(full, num_keys=nplanes)
        return [
            jax.lax.dynamic_slice_in_dim(x, r * n_shard, n_shard)
            for x in srt
        ]

    out = jax.lax.cond(overflow, fallback, finish, None)
    if return_overflow:
        # pmax above makes the flag axis-uniform, so it satisfies a
        # replicated out_spec (the adaptive tier syncs it host-side)
        return out + [overflow]
    return out


def _make_sharded_body(mesh, axis_name, nplanes, n_values, n_shard, d,
                       capacity, chunks, return_overflow=False,
                       finish_mode="auto", finish_plan_kwargs=None,
                       exchange="collective"):
    spec = P(axis_name)
    body = functools.partial(
        _global_sort_shard,
        nplanes=nplanes,
        n_shard=n_shard,
        d=d,
        axis=axis_name,
        capacity=capacity,
        chunks=chunks,
        return_overflow=return_overflow,
        finish_mode=finish_mode,
        finish_plan_kwargs=finish_plan_kwargs,
        exchange=exchange,
    )
    n_ops = nplanes + n_values
    out_specs = tuple(spec for _ in range(n_ops))
    if return_overflow:
        out_specs = out_specs + (P(),)
    return jax.jit(
        jax.shard_map(
            lambda *o: tuple(body(o)),
            mesh=mesh,
            in_specs=tuple(spec for _ in range(n_ops)),
            out_specs=out_specs,
            check_vma=False,
        )
    )


def _capacity_for(n_shard: int, d: int, capacity_factor: float,
                  chunks: int, quantum: int = 128) -> int:
    cap = min(
        n_shard,
        int(capacity_factor * max(n_shard // d, 1) + 127) // 128 * 128,
    )
    # chunked exchange slices the capacity axis evenly; the sorted-window
    # finish additionally needs whole engine tiles per window
    q = max(128 * chunks, quantum)
    cap = max(q, (cap + q - 1) // q * q)
    return cap


def make_global_sort(
    mesh: Mesh,
    *,
    axis_name: Optional[str] = None,
    capacity_factor: float = 4.0,
    chunks: int = 1,
    adaptive: bool = False,
    finish: str = "auto",
    exchange: str = "collective",
):
    """Build a jitted distributed sorter over a 1-D mesh axis.

    Returns fn(keys[, values]) operating on arrays sharded (or shardable)
    along the axis; output is the globally sorted array with the same
    sharding.  ``chunks`` splits the all-to-all into that many independent
    pieces along the capacity axis (overlappable transfers).

    ``finish`` selects the post-shuffle strategy: ``"collapse"`` compacts
    the received padded runs and runs a full engine sort;
    ``"windows"``/``"auto"`` feed the received runs — already sorted, each
    a monotone slice of a locally sorted shard — straight into the engine
    pipeline (window counts seed the validity chain, pass 0 is emit-only,
    the collapse disappears; DESIGN.md r5 sorted-window finish).  "auto"
    rounds the capacity to whole engine tiles and silently falls back to
    collapse where no windows plan exists (tiny shards).  Windows favors
    a LOW ``capacity_factor`` (~1.5-2): the pipeline processes the padded
    layout, so padding multiplies both ICI bytes and finish compute.

    ``adaptive=True`` is the host-owned capacity tier (the distributed
    analog of the single-chip ``on_overflow="flag"`` chain): after each
    call the overflow flag is synced to the host, and a geometry that
    overflowed doubles its ``capacity_factor`` for SUBSEQUENT calls
    (recompiling once) until the capacity saturates at n/D, where
    overflow is impossible.  The overflowed call itself is still exact
    (in-graph allgather fallback) — adaptation removes the fallback from
    steady-state repeated calls, at the price of one host sync per call.
    Leave off inside fully-pipelined training steps.
    """
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    d = mesh.shape[axis_name]
    shard_fns = {}   # geometry -> jitted shard body (persist across calls)
    factors = {}     # base geometry -> adapted capacity_factor

    def sorter(keys, values=None, *, descending: bool = False):
        n = keys.shape[0]
        if n % d:
            raise ValueError(f"n={n} must be divisible by mesh size {d}")
        if d == 1:
            # single device: the whole distributed machinery degenerates —
            # go straight to the local engine
            from tpusort.api import sort as _local_sort

            return _local_sort(keys, values, descending=descending,
                               stable=False)
        n_shard = n // d
        planes, traits = _dtypes.twiddle_in(keys, descending=descending)
        vt = (
            ()
            if values is None
            else ((values,) if not isinstance(values, (tuple, list))
                  else tuple(values))
        )
        vops = [jnp.asarray(v).view(jnp.uint32) for v in vt]
        ops = list(planes) + vops

        # windows finish wants capacity in whole engine tiles; the plan
        # geometry comes from the registered single-chip config.  "auto"
        # resolves to collapse off-TPU: the interpret-mode emulation of
        # the nested finish graphs is CI-hostile, and the windows path is
        # covered there by its explicit tests + the driver dryrun.
        from tpusort import configs as _configs

        fin_mode = finish
        if finish == "auto" and jax.default_backend() != "tpu":
            fin_mode = "collapse"
        cfg = _configs.get_config(32, bool(vt))
        fin_kwargs = {
            kk: vv for kk, vv in cfg.plan_kwargs().items() if kk != "min_n"
        }
        base = (len(planes), len(vops), n_shard)
        factor = factors.get(base, capacity_factor)
        capacity = _capacity_for(n_shard, d, factor, chunks)
        if fin_mode != "collapse" and len(planes) == 1:
            # round up to whole engine tiles so the windows plan exists —
            # unless that would blow the padding up (tiny shards: the
            # collapse finish is the right tool there anyway)
            cap_w = _capacity_for(n_shard, d, factor, chunks,
                                  quantum=fin_kwargs.get("k", 1 << 16))
            # never past n_shard (capacity == n_shard makes overflow
            # impossible — the adaptive tier's saturation invariant) and
            # never more than 2x the unquantized padding
            if cap_w <= 2 * capacity and cap_w <= n_shard:
                capacity = cap_w
        geom = base + (capacity,)
        shard_fn = shard_fns.get(geom)
        if shard_fn is None:
            # build the jitted shard body once per geometry: a fresh
            # wrapper per call would miss the jit cache and re-trace the
            # whole distributed program every sort
            shard_fn = shard_fns[geom] = _make_sharded_body(
                mesh, axis_name, len(planes), len(vops), n_shard, d,
                capacity, chunks, return_overflow=adaptive,
                finish_mode=fin_mode, finish_plan_kwargs=fin_kwargs,
                exchange=exchange,
            )
        out = shard_fn(*ops)
        if adaptive:
            out, ovf = list(out[:-1]), out[-1]
            if capacity < n_shard and bool(np.asarray(ovf)):
                factors[base] = factor * 2.0
        out_planes = tuple(out[: len(planes)])
        out_keys = _dtypes.twiddle_out(
            out_planes, traits, descending=descending, dtype=keys.dtype
        )
        out_vals = tuple(
            o.view(jnp.asarray(v).dtype) for o, v in zip(out[len(planes):], vt)
        )
        if values is None:
            return out_keys
        if isinstance(values, (tuple, list)):
            return out_keys, out_vals
        return out_keys, out_vals[0]

    sorter._factors = factors      # introspection (tests/adaptive tier)
    sorter._shard_fns = shard_fns
    return sorter


def make_global_sort_planes(
    mesh: Mesh,
    *,
    key_dtype: str = "uint64",
    axis_name: Optional[str] = None,
    capacity_factor: float = 4.0,
    chunks: int = 1,
    adaptive: bool = False,
):
    """Distributed sorter for keys supplied as raw uint32 bit-pattern
    planes (plane 0 = most-significant word) — the TPU-native 64-bit
    interface (this backend cannot materialize 64-bit arrays; see
    ``tpusort.sort_planes``).

    Returns fn(planes[, values]) -> sorted planes (and values).
    ``adaptive`` as in :func:`make_global_sort`."""
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    d = mesh.shape[axis_name]
    traits = _dtypes.traits_for(key_dtype)
    shard_fns = {}   # geometry -> jitted shard body (persist across calls)
    factors = {}     # base geometry -> adapted capacity_factor

    def sorter(planes, values=None, *, descending: bool = False):
        planes = tuple(jnp.asarray(p).view(jnp.uint32) for p in planes)
        if len(planes) != traits.planes:
            raise ValueError(
                f"{key_dtype} expects {traits.planes} planes, got "
                f"{len(planes)}"
            )
        n = planes[0].shape[0]
        if n % d:
            raise ValueError(f"n={n} must be divisible by mesh size {d}")
        if d == 1:
            # single device: degenerate (same guard as make_global_sort —
            # with nb = d-1 = 0 the tie-rank gather would index an empty
            # below[] array)
            from tpusort.api import sort_planes as _local_sort_planes

            return _local_sort_planes(
                planes, values, key_dtype=key_dtype, descending=descending,
                stable=False,
            )
        n_shard = n // d
        tw = _dtypes.twiddle_planes_in(planes, traits, descending=descending)
        vt = (
            ()
            if values is None
            else ((values,) if not isinstance(values, (tuple, list))
                  else tuple(values))
        )
        vops = [jnp.asarray(v).view(jnp.uint32) for v in vt]
        ops = list(tw) + vops
        base = (len(tw), len(vops), n_shard)
        factor = factors.get(base, capacity_factor)
        capacity = _capacity_for(n_shard, d, factor, chunks)
        geom = base + (capacity,)
        shard_fn = shard_fns.get(geom)
        if shard_fn is None:
            shard_fn = shard_fns[geom] = _make_sharded_body(
                mesh, axis_name, len(tw), len(vops), n_shard, d, capacity,
                chunks, return_overflow=adaptive,
            )
        out = shard_fn(*ops)
        if adaptive:
            out, ovf = list(out[:-1]), out[-1]
            if capacity < n_shard and bool(np.asarray(ovf)):
                factors[base] = factor * 2.0
        out_planes = tuple(
            _dtypes.twiddle_planes_out(
                tuple(out[: len(tw)]), traits, descending=descending
            )
        )
        out_vals = tuple(
            o.view(jnp.asarray(v).dtype) for o, v in zip(out[len(tw):], vt)
        )
        if values is None:
            return out_planes
        if isinstance(values, (tuple, list)):
            return out_planes, out_vals
        return out_planes, out_vals[0]

    sorter._factors = factors      # introspection (tests/adaptive tier)
    sorter._shard_fns = shard_fns
    return sorter


def global_sort(
    keys,
    values=None,
    *,
    mesh: Optional[Mesh] = None,
    descending: bool = False,
    capacity_factor: float = 4.0,
    chunks: int = 1,
):
    """One-shot distributed global sort over all devices (1-D mesh)."""
    if mesh is None:
        mesh = jax.make_mesh((len(jax.devices()),), ("x",))
    sorter = make_global_sort(mesh, capacity_factor=capacity_factor,
                              chunks=chunks)
    return sorter(keys, values, descending=descending)
