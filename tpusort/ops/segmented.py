"""Segmented (batched) sort — the ``DeviceSegmentedRadixSort`` analog
(``lsb/cub/cub/device/device_segmented_radix_sort.cuh``, SURVEY.md L-2/L-10).

Two paths:

* **uniform segments** (shape (B, K), K a multiple of 128 and <= 16K): the
  Pallas bitonic tile kernel sorts every segment in VMEM in one grid pass —
  the TPU's natural batched-sort shape;
* **ragged segments** (offsets array): a composite stable sort by
  (segment_id, key) via the variadic XLA sort — always correct, any
  geometry.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from tpusort import dtypes as _dtypes

__all__ = ["segmented_sort", "sort_batched"]

_MAX_TILE = 1 << 14


def sort_batched(
    keys: jax.Array,
    values=None,
    *,
    descending: bool = False,
    stable: bool = False,
):
    """Sort each row of (B, K) keys independently (uniform segments)."""
    b, k = keys.shape
    planes, traits = _dtypes.twiddle_in(keys.reshape(-1), descending=descending)
    vt, single = _normalize(values)
    vops = [jnp.asarray(v).view(jnp.uint32).reshape(b, k) for v in vt]

    use_pallas = (
        jax.default_backend() == "tpu"
        and traits.planes == 1
        and not stable
        and k % 128 == 0
        and k <= _MAX_TILE
        and all(jnp.dtype(v.dtype).itemsize == 4 for v in vt)
        # non-pow2 K pads tiles with the 0xFFFFFFFF sentinel; a real pair
        # whose twiddled key ties the sentinel could then lose its payload
        # to a pad slot (keys-only is multiset-exact either way) — same
        # hazard ops/small.py guards with its (pad and values) delegation
        and (not vt or (k & (k - 1)) == 0)
    )
    if use_pallas:
        from tpusort.kernels.bitonic import sort_tiles

        ops = [planes[0].reshape(b, k)] + vops
        out = sort_tiles(ops)
        sorted_planes = (out[0].reshape(-1),)
        sorted_vals = [o for o in out[1:]]
    else:
        key_ops = [p.reshape(b, k) for p in planes]
        res = jax.lax.sort(key_ops + vops, dimension=1,
                           num_keys=len(key_ops), is_stable=stable)
        sorted_planes = tuple(r.reshape(-1) for r in res[: len(key_ops)])
        sorted_vals = list(res[len(key_ops):])

    out_keys = _dtypes.twiddle_out(
        sorted_planes, traits, descending=descending, dtype=keys.dtype
    ).reshape(b, k)
    if values is None:
        return out_keys
    outs = tuple(
        o.reshape(b, k).view(jnp.asarray(v).dtype)
        for o, v in zip(sorted_vals, vt)
    )
    return out_keys, (outs[0] if single else outs)


def segmented_sort(
    keys: jax.Array,
    segment_offsets: jax.Array,
    values=None,
    *,
    descending: bool = False,
):
    """Stable sort within ragged segments.

    segment_offsets: (num_segments + 1,) int array of segment boundaries
    (CUB's begin/end offset convention, device_segmented_radix_sort.cuh),
    covering [0, n): offsets[0] == 0, offsets[-1] == n, non-decreasing.
    Uncovered elements have no defined destination in the boundary
    convention (the composite seg_id would wrap/collide), so non-covering
    concrete offsets are rejected rather than silently corrupting segments.
    """
    n = keys.shape[0]
    if not isinstance(segment_offsets, jax.core.Tracer):
        import numpy as np

        so = np.asarray(segment_offsets)
        if (so.ndim != 1 or so.shape[0] < 2 or so[0] != 0 or so[-1] != n
                or np.any(np.diff(so.astype(np.int64)) < 0)):
            raise ValueError(
                "segment_offsets must be a non-decreasing (num_segments+1,)"
                f" array covering [0, {n}) (got first={so.flat[0] if so.size else '?'},"
                f" last={so.flat[-1] if so.size else '?'})"
            )
    planes, traits = _dtypes.twiddle_in(keys, descending=descending)
    vt, single = _normalize(values)

    pos = jnp.arange(n, dtype=jnp.int32)
    seg_id = (
        jnp.searchsorted(segment_offsets.astype(jnp.int32), pos, side="right")
        - 1
    ).astype(jnp.uint32)

    nseg = int(segment_offsets.shape[0]) - 1
    if (
        jax.default_backend() == "tpu"
        and traits.planes == 1
        and not vt
        and nseg >= 1
    ):
        # keys-only ragged: composite (seg_id << shift, key) through the
        # 2-plane raw engine.  Shifting seg_id to the top bits spreads the
        # MSD digits across segments (a raw seg_id would put everything in
        # digit 0 and trip the overflow fallback); keys-only stability is
        # vacuous so the unstable path is exact.
        shift = 32 - max((nseg - 1).bit_length(), 1)
        from tpusort.ops.msd import sort_twiddled_msd

        sp, _ = sort_twiddled_msd(
            (seg_id << jnp.uint32(shift), planes[0]), (),
            begin_bit=0, end_bit=64, total_bits=64,
        )
        sorted_planes = (sp[1],)
        out_keys = _dtypes.twiddle_out(
            sorted_planes, traits, descending=descending, dtype=keys.dtype
        )
        return out_keys

    operands = [seg_id] + list(planes) + [jnp.asarray(v) for v in vt]
    res = jax.lax.sort(operands, num_keys=1 + len(planes), is_stable=True)
    sorted_planes = tuple(res[1 : 1 + len(planes)])
    out_keys = _dtypes.twiddle_out(
        sorted_planes, traits, descending=descending, dtype=keys.dtype
    )
    if values is None:
        return out_keys
    outs = tuple(res[1 + len(planes):])
    return out_keys, (outs[0] if single else outs)


def _normalize(values) -> Tuple[Tuple[jax.Array, ...], bool]:
    if values is None:
        return (), False
    if isinstance(values, (tuple, list)):
        return tuple(values), False
    return (values,), True
