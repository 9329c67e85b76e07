"""Distributed multi-chip / multi-host global sort.

The reference is single-device (SURVEY.md §2.3); this supplies the
north-star capability (BASELINE.json config #5): keys range-partitioned via
splitters, redistributed by an all-to-all shuffle, locally sorted — globally
sorted by construction.

TPU-native design decisions (static shapes, XLA collectives over ICI):

* **Exact splitters, not sampled.** Output shards must be STATIC-shape
  (N/D per device), so splitters are exact global order statistics,
  computed by a bitwise distributed selection: 32 rounds of prefix
  refinement, each a vectorized count + ``psum`` — no data movement.
* **Skew-proof tie quotas.** Elements equal to a splitter are split across
  devices by their global tie rank (destination = (below + tie_rank) //
  shard), so even a single repeated value load-balances exactly — stronger
  than the reference's hot-bucket handling (cuda_radix_sort.h:437-447).
* **Static padded all-to-all.** Each device sends its bucket-d run padded
  to a fixed capacity C; ``jax.lax.all_to_all`` moves (D, C) blocks over
  ICI.  Pair counts above C (pathologically pre-ordered inputs with small
  capacity) are detected and the sort falls back to an allgather + local
  sort via ``lax.cond``.
* Validity is positional (slot s of a received run is garbage iff
  s >= count), the same convention as the single-chip MSD engine.

Current scope: 32-bit key families (u32/i32/f32); 32-bit payloads; 64-bit
keys take the allgather fallback path.  Pairs are sorted unstably across
hosts (keys bit-exact; pair equivalence is permutation-level, matching the
reference's own unstable-pair test semantics, test_sort_pairs.cu:81-113).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusort import dtypes as _dtypes

__all__ = ["global_sort", "make_global_sort"]


def _select_splitters(tw: jax.Array, n_shard: int, d: int, axis: str):
    """Exact order statistics at ranks b*n_shard (b=1..D-1) of the global
    twiddled key multiset, plus the strictly-below counts.

    Bitwise radix selection: 32 rounds of count+psum, all boundaries in
    parallel.  Returns (splitters (D-1,) uint32, below (D-1,) int32).
    """
    nb = d - 1
    ranks = (jnp.arange(1, d, dtype=jnp.int32)) * n_shard

    def round_(i, state):
        prefix, below = state
        bit = 31 - i
        cand0 = prefix << jnp.uint32(1)
        shifted = tw >> jnp.uint32(bit)
        local = (shifted[:, None] == cand0[None, :]).sum(0, dtype=jnp.int32)
        c0 = jax.lax.psum(local, axis)
        choose0 = (ranks - below) < c0
        prefix = jnp.where(choose0, cand0, cand0 + jnp.uint32(1))
        below = jnp.where(choose0, below, below + c0)
        return prefix, below

    prefix0 = jnp.zeros((nb,), jnp.uint32)
    below0 = jnp.zeros((nb,), jnp.int32)
    return jax.lax.fori_loop(0, 32, round_, (prefix0, below0))


def _destinations_sorted(tw_s, splitters, below, n_shard, d, axis):
    """Bucket starts/counts for a LOCALLY SORTED shard (exact tie quotas).

    Sorting first makes every tie run contiguous: rank-within-value is
    position minus run start (one cummax scan), destinations are monotone
    by construction, and bucket boundaries come from a (d,)-sized
    searchsorted — O(n log d) total, no per-splitter passes and no (n, d)
    one-hot.  An element ties at most one splitter GROUP (equal splitters
    share a value; ``tie_idx = gt`` points at the group's first slot, and
    ``below + global tie rank`` spreads the group's value across its full
    span of shards).
    """
    nb = d - 1
    r = jax.lax.axis_index(axis)
    n = tw_s.shape[0]
    gt = jnp.searchsorted(splitters, tw_s, side="left").astype(jnp.int32)
    ge = jnp.searchsorted(splitters, tw_s, side="right").astype(jnp.int32)
    is_tie = ge > gt
    tie_idx = jnp.clip(gt, 0, nb - 1)

    # local tie counts per splitter group (stored at the group's first slot)
    ssl = jnp.searchsorted(tw_s, splitters, side="left").astype(jnp.int32)
    ssr = jnp.searchsorted(tw_s, splitters, side="right").astype(jnp.int32)
    first_of_group = jnp.concatenate(
        [jnp.ones((1,), bool), splitters[1:] != splitters[:-1]]
    )
    t_local = jnp.where(first_of_group, ssr - ssl, 0)
    t_all = jax.lax.all_gather(t_local, axis)                # (D, nb)
    p_r = jnp.where(
        (jnp.arange(d) < r)[:, None], t_all, 0
    ).sum(0, dtype=jnp.int32)                                # (nb,)

    idx = jnp.arange(n, dtype=jnp.int32)
    neq = jnp.concatenate([jnp.ones((1,), bool), tw_s[1:] != tw_s[:-1]])
    run_start = jax.lax.cummax(jnp.where(neq, idx, 0))
    j = idx - run_start                                      # tie rank

    dest_tie = (below[tie_idx] + p_r[tie_idx] + j) // n_shard
    dest = jnp.clip(jnp.where(is_tie, dest_tie, gt), 0, d - 1)
    starts = jnp.searchsorted(dest, jnp.arange(d), side="left").astype(
        jnp.int32
    )
    counts = jnp.concatenate(
        [starts[1:], jnp.asarray([n], jnp.int32)]
    ) - starts
    return starts, counts


def _global_sort_shard(
    ops: Sequence[jax.Array],
    nplanes: int,
    n_shard: int,
    d: int,
    axis: str,
    capacity: int,
):
    """Per-shard body (runs under shard_map). ops = planes + values, u32."""
    tw = ops[0]
    splitters, below = _select_splitters(tw, n_shard, d, axis)

    # local sort BY KEY first (the engine's cheapest path), so splitter
    # buckets are contiguous runs and tie ranks are positional — this
    # replaces the former (dest | idx)-sortkey sort + per-splitter cumsum
    # loop + (n, d) one-hot counts.
    from tpusort.ops.msd import sort_twiddled_msd

    if len(ops) == 1:
        (tw_s,), _ = sort_twiddled_msd(
            (tw,), (), begin_bit=0, end_bit=32, total_bits=32,
            skew_tier=False,
        )
        sorted_ops = [tw_s]
    else:
        # pairs ride the unstable raw path (global pair semantics are
        # unstable anyway; the engine pre-checks its 0xFFFFFFFF sentinel)
        sp, sv = sort_twiddled_msd(
            (tw,), tuple(ops[1:]), begin_bit=0, end_bit=32, total_bits=32,
            stable=False, skew_tier=False,
        )
        tw_s = sp[0]
        sorted_ops = [tw_s] + list(sv)
    starts, counts = _destinations_sorted(
        tw_s, splitters, below, n_shard, d, axis
    )
    # padded-run expansion via d contiguous dynamic slices (a flat gather
    # here costs ~30x HBM bandwidth on TPU; slices are plain copies).  The
    # capacity tail pad keeps every slice in-bounds so runs stay at the
    # front of their window (positional validity on the receive side).
    def _expand(o):
        opad = jnp.concatenate([o, jnp.zeros((capacity,), o.dtype)])
        return jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(opad, starts[b], capacity)
                for b in range(d)
            ]
        )

    send = [_expand(o) for o in sorted_ops]

    # exchange padded blocks + counts
    recv = [
        jax.lax.all_to_all(s, axis, split_axis=0, concat_axis=0, tiled=True)
        for s in send
    ]
    cmat = jax.lax.all_gather(counts, axis)                  # (D src, D dst)
    r = jax.lax.axis_index(axis)
    recv_counts = cmat[:, r]                                  # (D,)
    overflow = jax.lax.pmax(jnp.max(cmat), axis) > capacity

    # positional validity, then the local finishing sort
    pos = jnp.arange(capacity, dtype=jnp.int32)[None, :]
    valid = (pos < recv_counts[:, None]).reshape(-1)
    flat = [x.reshape(-1) for x in recv]
    if nplanes == 1 and len(flat) == 1:
        # keys-only: garbage -> 0xFFFFFFFF is multiset-exact (each shard
        # receives exactly n_shard valid keys, so the first n_shard slots of
        # the engine-sorted buffer are the owned range)
        rewritten = jnp.where(valid, flat[0], jnp.uint32(0xFFFFFFFF))
        sp, _ = sort_twiddled_msd(
            (rewritten,), (), begin_bit=0, end_bit=32, total_bits=32,
        )
        owned = [sp[0][:n_shard]]
    else:
        # pairs / multi-plane: invalid flag FIRST so garbage slots
        # (arbitrary copied values) sort after every valid element, then
        # valids order by their key planes
        invalid_key = (~valid).astype(jnp.uint32)
        keys = [invalid_key] + list(flat[:nplanes])
        result = jax.lax.sort(keys + flat, num_keys=nplanes + 1)[nplanes + 1:]
        owned = [x[:n_shard] for x in result]

    def fallback(_):
        # allgather everything, sort locally, take the owned range
        full = [jax.lax.all_gather(o, axis).reshape(-1) for o in ops]
        srt = jax.lax.sort(full, num_keys=nplanes)
        return [
            jax.lax.dynamic_slice_in_dim(x, r * n_shard, n_shard)
            for x in srt
        ]

    return jax.lax.cond(overflow, fallback, lambda _: owned, None)


def make_global_sort(
    mesh: Mesh,
    *,
    axis_name: Optional[str] = None,
    capacity_factor: float = 4.0,
):
    """Build a jitted distributed sorter over a 1-D mesh axis.

    Returns fn(keys[, values]) operating on arrays sharded (or shardable)
    along the axis; output is the globally sorted array with the same
    sharding.
    """
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    d = mesh.shape[axis_name]

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
        capacity = min(
            n_shard, int(capacity_factor * max(n_shard // d, 1) + 127) // 128 * 128
        )
        planes, traits = _dtypes.twiddle_in(keys, descending=descending)
        if traits.planes != 1:
            raise NotImplementedError(
                "distributed sort currently supports 32-bit key dtypes"
            )
        vt = (
            ()
            if values is None
            else ((values,) if not isinstance(values, (tuple, list))
                  else tuple(values))
        )
        vops = [jnp.asarray(v).view(jnp.uint32) for v in vt]
        ops = list(planes) + vops

        spec = P(axis_name)
        body = functools.partial(
            _global_sort_shard,
            nplanes=len(planes),
            n_shard=n_shard,
            d=d,
            axis=axis_name,
            capacity=capacity,
        )
        shard_fn = jax.jit(
            jax.shard_map(
                lambda *o: tuple(body(o)),
                mesh=mesh,
                in_specs=tuple(spec for _ in ops),
                out_specs=tuple(spec for _ in ops),
                check_vma=False,
            )
        )
        out = shard_fn(*ops)
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

    return sorter


def global_sort(
    keys,
    values=None,
    *,
    mesh: Optional[Mesh] = None,
    descending: bool = False,
    capacity_factor: float = 4.0,
):
    """One-shot distributed global sort over all devices (1-D mesh)."""
    if mesh is None:
        mesh = jax.make_mesh((len(jax.devices()),), ("x",))
    sorter = make_global_sort(mesh, capacity_factor=capacity_factor)
    return sorter(keys, values, descending=descending)
