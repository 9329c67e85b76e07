"""Public sort API.

TPU-native re-design of the reference's two public surfaces:

* ``cub::DeviceRadixSort::{SortKeys, SortPairs, *Descending}`` with
  ``begin_bit``/``end_bit`` sub-range sorts
  (``lsb/cub/cub/device/device_radix_sort.cuh:147-660``), and
* the MSB entry points ``rdxsrt_unstable_sort{,_keys,_pairs}``
  (``msb/src/sort/gpu_radix_sort.h:197-587``).

Differences by design (TPU/JAX idiom, not translation):

* No two-call temp-storage protocol and no ``DoubleBuffer`` — XLA owns
  allocation and buffer ping-ponging; every function is functional and
  jit-able.
* 64-bit keys are decomposed into uint32 planes at the boundary
  (see :mod:`tpusort.dtypes`), so no 64-bit arithmetic reaches a kernel.
* Engine selection is a runtime registry (analog of the reference's
  kernel-config registries, ``msb/src/sort/gpu_sort_config.h:267-336``).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from tpusort import configs as _configs
from tpusort import dtypes as _dtypes
from tpusort.ops.reference import sort_twiddled_reference

__all__ = [
    "sort",
    "argsort",
    "sort_keys",
    "sort_keys_descending",
    "sort_pairs",
    "sort_pairs_descending",
    "sort_planes",
    "unstable_sort_keys",
    "unstable_sort_pairs",
    "sort_pairs_lsb_in_value",
    "register_engine",
    "available_engines",
]


# ---------------------------------------------------------------------------
# Engine registry
# ---------------------------------------------------------------------------

# An engine sorts twiddled uint32 plane(s) + payload arrays ascending:
#   engine(planes, values, begin_bit, end_bit, total_bits, config)
#     -> (sorted_planes, sorted_values)
Engine = Callable[..., Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...]]]

_ENGINES: Dict[str, Engine] = {}


def register_engine(name: str, fn: Engine) -> None:
    _ENGINES[name] = fn


def _call_engine(engine: Engine, planes, values_tuple, **kw):
    """Invoke an engine, passing ``config=`` only if its signature takes it
    (user engines registered against the documented Engine contract predate
    the config kwarg and must keep working)."""
    import inspect

    try:
        params = inspect.signature(engine).parameters
        takes_config = "config" in params or any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
        )
    except (TypeError, ValueError):
        takes_config = False
    if not takes_config:
        kw.pop("config", None)
    return engine(planes, values_tuple, **kw)


def available_engines() -> Tuple[str, ...]:
    return tuple(sorted(_ENGINES))


register_engine("reference", sort_twiddled_reference)
# "xla" is the production alias of the masked-plane stable variadic sort:
# XLA's native sort is the measured bar (366 M keys/s on v5e, DESIGN.md)
# and the correctness fallback for pathological inputs.
register_engine("xla", sort_twiddled_reference)


def _register_builtin_engines():
    from tpusort.ops.msd import sort_twiddled_msd
    from tpusort.ops.small import sort_twiddled_bitonic

    register_engine("msd", sort_twiddled_msd)
    # unstable pairs fast path: raw-key 2-operand networks, the analog of
    # the reference's rdxsrt_unstable_sort_pairs
    # (msb/src/sort/gpu_radix_sort.h:544-587)
    register_engine(
        "msd_unstable", functools.partial(sort_twiddled_msd, stable=False)
    )
    # adaptive equi-depth splitter engine: balanced buckets for skewed
    # distributions (the reference's dynamic hot-bucket handling, made
    # static via sampled splitters; keys-only)
    from tpusort.ops.equidepth import sort_twiddled_equidepth

    register_engine("msd_equidepth", sort_twiddled_equidepth)
    # The MSD hybrid here is stable (position-index tiebreaks throughout),
    # so it provides the reference's LSB/stable semantics too; "lsd" is the
    # CUB-parity name (device_radix_sort.cuh:147-660).
    register_engine("lsd", sort_twiddled_msd)
    # single-tile small-N fast path (InvokeSingleTile / sorting-network
    # analog); unstable
    register_engine("bitonic", sort_twiddled_bitonic)


_register_builtin_engines()


def _resolve_engine(algorithm: str, config: _configs.SortConfig) -> Engine:
    if algorithm == "auto":
        algorithm = config.default_algorithm
        if algorithm not in _ENGINES:
            algorithm = "reference"
    if algorithm not in _ENGINES:
        raise ValueError(
            f"unknown algorithm {algorithm!r}; available: {available_engines()}"
        )
    return _ENGINES[algorithm]


# ---------------------------------------------------------------------------
# Public functions
# ---------------------------------------------------------------------------


def _normalize_values(values) -> Tuple[Tuple[jax.Array, ...], bool, bool]:
    """Returns (value_tuple, had_values, was_single)."""
    if values is None:
        return (), False, False
    if isinstance(values, (tuple, list)):
        return tuple(values), True, False
    return (values,), True, True


@functools.partial(
    jax.jit,
    static_argnames=(
        "descending",
        "begin_bit",
        "end_bit",
        "algorithm",
        "dimension",
        "stable",
        "cfg",
    ),
)
def _sort_impl(
    keys,
    values_tuple,
    *,
    descending: bool,
    begin_bit: int,
    end_bit: Optional[int],
    algorithm: str,
    dimension: int,
    stable: bool = True,
    cfg: Optional[_configs.SortConfig] = None,
):
    if dimension != 0 or keys.ndim != 1:
        raise NotImplementedError("tpusort currently sorts 1-D arrays")
    planes, traits = _dtypes.twiddle_in(keys, descending=descending)
    total_bits = traits.bits
    eb = total_bits if end_bit is None else end_bit
    if not (0 <= begin_bit < eb <= total_bits):
        raise ValueError(f"invalid bit range [{begin_bit}, {eb}) for {traits.name}")
    if cfg is None:
        cfg = _configs.get_config(total_bits, bool(values_tuple))
    if not stable and algorithm in ("auto", "msd", "lsd") and \
            "msd_unstable" in _ENGINES:
        algorithm = "msd_unstable"
    engine = _resolve_engine(algorithm, cfg)
    sorted_planes, sorted_values = _call_engine(
        engine,
        planes,
        values_tuple,
        begin_bit=begin_bit,
        end_bit=eb,
        total_bits=total_bits,
        config=cfg,
    )
    out_keys = _dtypes.twiddle_out(
        sorted_planes, traits, descending=descending, dtype=keys.dtype
    )
    return out_keys, sorted_values


# ---------------------------------------------------------------------------
# Host-owned tiering (the reference's CPU-in-the-loop planner analog,
# ``msb/src/sort/gpu_radix_sort.cu:29-104``: the host plans while the GPU
# runs — its planner overlaps the device via streams,
# ``msb/src/sort/gpu_radix_sort.h:240-257``).  The round-5 design removes
# the eager API's host-sync tax (measured ~30% at 2^28 in r4: sample fetch
# + presorted check + flag readback were three serialized tunnel round
# trips, ~26 ms each):
#
# * **tier-decision cache**: the classification for a
#   (shape, dtype, distribution-class) is remembered across calls, so a
#   steady workload dispatches its sort immediately;
# * **overlapped classification**: the strided-sample graph is dispatched
#   BEFORE the sort, and fetched while the sort runs — the round trip
#   hides entirely under the device work; the result refreshes the cache
#   for the next call;
# * **in-graph safety net instead of a flag readback**: at n <= _COND_MAX
#   the radix tier runs with its lax.cond overflow fallback (exactly what
#   jit callers get), so no host sync is needed for correctness.  Above
#   _COND_MAX the cond branch's workspace RESERVATION exceeds HBM and the
#   flag-mode chain (radix -> equi-depth -> exact, one readback per tier)
#   still applies — there the sort is >= 600 ms and the readback is noise.
# ---------------------------------------------------------------------------

_TIERED_ALGOS = ("msd", "lsd", "msd_unstable")

# Above this the in-graph cond fallback would RESERVE the reference sort's
# workspace on top of the pipeline's live set (> 16 GB HBM) — the host
# owns the fallback decision there (flag mode).  Multi-operand shapes
# (pairs / 64-bit planes) carry 2-4x the bytes, so their ceiling halves.
_COND_MAX = 1 << 29

# (shape, dtypes, flags, cfg) -> {"presorted": bool, "tier": str}
_TIER_CACHE: Dict[tuple, dict] = {}


@functools.partial(
    jax.jit,
    static_argnames=("descending", "begin_bit", "end_bit", "tier",
                     "stable", "cfg", "mode"),
)
def _sort_tier_impl(
    keys,
    values_tuple,
    *,
    descending: bool,
    begin_bit: int,
    end_bit: Optional[int],
    tier: str,
    stable: bool,
    cfg: _configs.SortConfig,
    mode: str = "flag",
):
    from tpusort.ops.equidepth import sort_twiddled_equidepth
    from tpusort.ops.msd import sort_twiddled_msd

    planes, traits = _dtypes.twiddle_in(keys, descending=descending)
    total_bits = traits.bits
    eb = total_bits if end_bit is None else end_bit
    ovf = jnp.asarray(False)
    if tier == "radix" and mode == "cond":
        # in-graph overflow fallback (identical to the jit path): one
        # dispatch, no flag readback; skew_tier auto-gates in-graph
        sp, sv = sort_twiddled_msd(
            planes, values_tuple, begin_bit=begin_bit, end_bit=eb,
            total_bits=total_bits, stable=stable, on_overflow="cond",
            config=cfg,
        )
    elif tier == "radix":
        sp, sv, ovf = sort_twiddled_msd(
            planes, values_tuple, begin_bit=begin_bit, end_bit=eb,
            total_bits=total_bits, stable=stable, on_overflow="flag",
            skew_tier=False, config=cfg,
        )
    elif tier == "equidepth":
        sp, sv, ovf = sort_twiddled_equidepth(
            planes, values_tuple, begin_bit=begin_bit, end_bit=eb,
            total_bits=total_bits, stable=stable, on_overflow="flag",
            config=cfg,
        )
    else:
        sp, sv = sort_twiddled_reference(
            planes, values_tuple, begin_bit=begin_bit, end_bit=eb,
            total_bits=total_bits,
        )
    out_keys = _dtypes.twiddle_out(
        sp, traits, descending=descending, dtype=keys.dtype
    )
    return out_keys, sv, ovf


def _tier_chain(cfg) -> Tuple[str, ...]:
    """Fallback tiers after the radix engine.  The equi-depth tier runs by
    default on TPU; elsewhere (CPU tests run Pallas in interpret mode,
    ~100x slow) it needs the config's explicit ``skew_tier=True``."""
    use_eq = cfg.skew_tier
    if use_eq is None:
        use_eq = jax.default_backend() == "tpu"
    return ("radix", "equidepth", "exact") if use_eq else ("radix", "exact")


@functools.partial(jax.jit, static_argnames=("stride", "descending"))
def _planner_sample_impl(keys, stride: int, descending: bool):
    planes, _ = _dtypes.twiddle_in(keys, descending=descending)
    p0 = planes[0]
    return jax.lax.slice(p0, (0,), (p0.shape[0],), (stride,))


@functools.partial(jax.jit, static_argnames=("stride", "key_dtype",
                                             "descending"))
def _planner_sample_planes_impl(planes, stride: int, key_dtype: str,
                                descending: bool):
    traits = _dtypes.traits_for(key_dtype)
    tw = _dtypes.twiddle_planes_in(
        tuple(jnp.asarray(p).view(jnp.uint32) for p in planes),
        traits, descending=descending,
    )
    return jax.lax.slice(tw[0], (0,), (tw[0].shape[0],), (stride,))


def _lex_sorted(planes):
    """Lexicographic non-decreasing check over twiddled uint32 planes."""
    lt = jnp.zeros(planes[0].shape[0] - 1, bool)
    eq = jnp.ones(planes[0].shape[0] - 1, bool)
    for p in planes:
        lt = lt | (eq & (p[:-1] < p[1:]))
        eq = eq & (p[:-1] == p[1:])
    return jnp.all(lt | eq)


@functools.partial(jax.jit, static_argnames=("descending",))
def _is_sorted_keys_impl(keys, descending: bool):
    """Fused twiddle + sortedness -> scalar (no full-size twiddled
    intermediate is ever committed; XLA fuses the twiddle into the
    reduction — at 2^30 a materialized plane would be ~4 GB of HBM)."""
    planes, _ = _dtypes.twiddle_in(keys, descending=descending)
    return _lex_sorted(planes)


@functools.partial(jax.jit, static_argnames=("key_dtype", "descending"))
def _is_sorted_planes_impl(planes, key_dtype: str, descending: bool):
    traits = _dtypes.traits_for(key_dtype)
    tw = _dtypes.twiddle_planes_in(
        tuple(jnp.asarray(p).view(jnp.uint32) for p in planes),
        traits, descending=descending,
    )
    return _lex_sorted(tw)


def _skip_radix_tier(sample, n, begin_bit, end_bit, total_bits,
                     cfg) -> bool:
    """Host pre-classifier (the reference's CPU planner analog,
    gpu_radix_sort.cu:29-104): predict from a strided sample whether the
    radix tier's static capacities are doomed, and skip straight to the
    skew tier if so.  Mispredictions are safe — the flag-mode overflow
    check (or the in-graph cond fallback) still guards correctness."""
    from tpusort import planner
    from tpusort.ops import msd as _msd

    eb = total_bits if end_bit is None else end_bit
    if sample is None or begin_bit != 0 or eb != total_bits:
        return False
    kwargs = {k: v for k, v in cfg.plan_kwargs().items() if k != "min_n"}
    plan = _msd.plan_msd(n, 0, eb, **kwargs)
    if plan is None:
        return False
    return planner.predict_radix_overflow(sample, plan, n)


def _run_tier_chain(dispatch, cfg, skip_radix=False, cond_ok=False,
                    first_sync=None):
    """Run the fallback tiers until one succeeds.

    ``dispatch(tier, mode)`` -> (keys, values, overflow).  With
    ``cond_ok`` the radix tier carries its own in-graph fallback (single
    dispatch, no readback); otherwise each tier's overflow flag is read
    back and the next tier re-dispatched.  ``first_sync`` (the cache
    refresh) runs right after the first dispatch so its host round trip
    overlaps the running sort."""
    tiers = _tier_chain(cfg)
    if skip_radix and len(tiers) > 2:
        tiers = tiers[1:]
    out_k = out_v = None
    for i, tier in enumerate(tiers):
        if out_k is not None:
            del out_k, out_v      # free the overflowed tier's garbage
        if cond_ok and tier == "radix":
            out_k, out_v, _ = dispatch(tier, "cond")
            if first_sync is not None:
                first_sync()
            break                 # in-graph fallback: always correct
        out_k, out_v, ovf = dispatch(tier, "flag")
        if first_sync is not None:
            first_sync()
            first_sync = None
        if i == len(tiers) - 1 or not bool(ovf):
            break
    return out_k, out_v


def _tiered_flow(ckey, n, n_ops, classify, decide, cfg, dispatch, identity):
    """The host tiering flow shared by ``sort`` and ``sort_planes``.

    ``classify``: None (problem too small / sub-range sort — dispatch the
    default chain with zero host syncs), or ``(sample_dev, check_fn)``
    where ``sample_dev`` is the ALREADY-DISPATCHED strided-sample device
    array (queued ahead of the sort, so fetching it overlaps the sort's
    device time) and ``check_fn`` runs the fused full-input sortedness
    check.  ``decide(sample) -> (presorted_likely, tier)`` is the host
    classifier; its result is cached under ``ckey`` so steady workloads
    skip the classify wait entirely.  ``identity()`` returns the
    presorted short-circuit output (the reference's finished buckets
    skipping every remaining pass, gpu_radix_sort.h:359-360,482-485,
    taken to the limit — constant keys included)."""
    cond_ok = n <= (_COND_MAX if n_ops == 1 else _COND_MAX // 2)
    if classify is None:
        return _run_tier_chain(dispatch, cfg, cond_ok=cond_ok)
    sample_dev, check_fn = classify
    if len(_TIER_CACHE) > 256:
        _TIER_CACHE.clear()
    cached = _TIER_CACHE.get(ckey)
    if cached is None or cached["presorted"]:
        # cold (or presorted-likely): classify BEFORE dispatching the
        # sort, so a presorted input costs one comparison pass, not a sort
        presorted, tier = decide(np.asarray(sample_dev))
        if presorted and bool(np.asarray(check_fn())):
            _TIER_CACHE[ckey] = {"presorted": True, "tier": tier}
            return identity()
        _TIER_CACHE[ckey] = {"presorted": False, "tier": tier}
        return _run_tier_chain(dispatch, cfg,
                               skip_radix=(tier == "equidepth"),
                               cond_ok=cond_ok)
    # steady state: dispatch by the cached tier immediately; the classify
    # fetch runs while the sort executes and refreshes the cache
    tier = cached["tier"]

    def refresh():
        p, t = decide(np.asarray(sample_dev))
        _TIER_CACHE[ckey] = {"presorted": p, "tier": t}

    return _run_tier_chain(dispatch, cfg,
                           skip_radix=(tier == "equidepth"),
                           cond_ok=cond_ok, first_sync=refresh)


def _sort_host_tiered(keys, vt, *, descending, begin_bit, end_bit, stable,
                      cfg):
    from tpusort import planner

    kw = dict(descending=descending, begin_bit=begin_bit, end_bit=end_bit,
              stable=stable, cfg=cfg)
    n = keys.shape[0]
    total_bits = _dtypes.key_bits(keys.dtype)
    eb = total_bits if end_bit is None else end_bit

    def dispatch(tier, mode):
        return _sort_tier_impl(keys, vt, tier=tier, mode=mode, **kw)

    def identity():
        # coerce: the tier-chain path returns JAX arrays for values, so
        # the identity short-circuit must too (callers may pass numpy
        # arrays / lists)
        return keys, tuple(jnp.asarray(v) for v in vt)

    def decide(sample):
        presorted = planner.predict_presorted([sample])
        tier = "radix"
        if "equidepth" in _tier_chain(cfg) and _skip_radix_tier(
                sample, n, begin_bit, end_bit, total_bits, cfg):
            tier = "equidepth"
        return presorted, tier

    classify = None
    if begin_bit == 0 and eb == total_bits and n >= planner.PLANNER_MIN_N:
        stride = max(1, n // planner.SAMPLE_TARGET)
        classify = (
            _planner_sample_impl(keys, stride, descending),
            lambda: _is_sorted_keys_impl(keys, descending),
        )
    ckey = ("k", n, str(keys.dtype),
            tuple(str(getattr(v, "dtype", "?")) for v in vt),
            descending, stable, begin_bit, eb, cfg)
    return _tiered_flow(ckey, n, 1 + len(vt), classify, decide, cfg,
                        dispatch, identity)


def _host_tiered_applicable(keys, values_tuple, algorithm, cfg) -> bool:
    """Host tiering needs a concrete (non-traced) input — inside a user's
    jit the in-graph lax.cond fallback applies instead — and one of the
    radix engines."""
    if isinstance(keys, jax.core.Tracer):
        return False
    algo = cfg.default_algorithm if algorithm == "auto" else algorithm
    if algo not in _TIERED_ALGOS:
        return False
    return not any(isinstance(v, jax.core.Tracer) for v in values_tuple)


def _op_dtype(a) -> np.dtype:
    """Array-like dtype without materializing or transferring anything."""
    d = getattr(a, "dtype", None)
    return np.dtype(d) if d is not None else np.asarray(a).dtype


def _sort_64bit_boundary(keys, vt, had, single, kd, *, descending,
                         begin_bit, end_bit, algorithm, stable):
    """Host-side 64-bit boundary: this backend cannot materialize 64-bit
    arrays, so 64-bit keys/values are bitcast into uint32 planes ON THE
    HOST, sorted through the plane interface, and reassembled.  This
    makes the public ``sort()`` accept every key dtype of the reference's
    ``Traits`` (``lsb/cub/cub/util_type.cuh:1104-1130``) and the full
    {4,8}-byte key x value tuning matrix
    (``msb/src/sort/gpu_sort_config.h:146-207``).  64-bit operands come
    back as numpy arrays (no device type can hold them); 32-bit payloads
    stay device arrays."""
    if np.asarray(keys).ndim != 1:
        raise NotImplementedError("tpusort currently sorts 1-D arrays")
    if kd.itemsize == 8:
        planes = _dtypes.split64_host(keys)
        key_dtype = kd.name
    else:
        planes = (np.ascontiguousarray(np.asarray(keys)).view(np.uint32),)
        key_dtype = kd.name
    proc_vals: list = []
    spec = []
    for v in vt:
        vd = _op_dtype(v)
        if vd.itemsize == 8:
            vhi, vlo = _dtypes.split64_host(v)
            proc_vals += [vhi, vlo]
            spec.append(("v64", vd))
        else:
            proc_vals.append(v)
            spec.append(("v32", vd))
    out = sort_planes(
        planes, proc_vals or None, key_dtype=key_dtype,
        descending=descending, begin_bit=begin_bit, end_bit=end_bit,
        algorithm=algorithm, stable=stable,
    )
    out_planes = out[0] if had else out
    if kd.itemsize == 8:
        out_keys = _dtypes.join64_host(out_planes[0], out_planes[1], kd)
    else:
        out_keys = np.asarray(out_planes[0]).view(kd)
    if not had:
        return out_keys
    raw = list(out[1])
    out_vals = []
    for kind, vd in spec:
        if kind == "v64":
            vhi, vlo = raw.pop(0), raw.pop(0)
            out_vals.append(_dtypes.join64_host(vhi, vlo, vd))
        else:
            # 32-bit payloads come back already viewed to their dtype
            out_vals.append(raw.pop(0))
    return out_keys, (out_vals[0] if single else tuple(out_vals))


def sort(
    keys: jax.Array,
    values=None,
    *,
    descending: bool = False,
    begin_bit: int = 0,
    end_bit: Optional[int] = None,
    algorithm: str = "auto",
    stable: bool = True,
):
    """Radix sort of ``keys`` (optionally carrying ``values``).

    Parameters mirror the reference API surface: ``descending`` (CUB
    ``SortKeysDescending``/``SortPairsDescending``), ``begin_bit``/``end_bit``
    sub-range comparison, and ``values`` as either a single array or a tuple
    of payload arrays.  ``stable=False`` permits reordering of equal-key
    payloads for speed (the reference MSB sort's semantics,
    ``msb/src/sort/gpu_radix_sort.h:197``); keys-only output is identical
    either way.  Returns sorted keys, or ``(keys, values)`` when values are
    given.

    64-bit key/value dtypes (uint64/int64/float64) are accepted even when
    the backend cannot hold 64-bit arrays (TPU): they are split into
    uint32 planes at the host boundary and reassembled, so those operands
    return as numpy arrays (see :func:`sort_planes` for the fully
    device-resident 64-bit interface).
    """
    vt, had, single = _normalize_values(values)
    kd = _op_dtype(keys)
    if not jax.config.jax_enable_x64 and (
        kd.itemsize == 8
        or any(_op_dtype(v).itemsize == 8 for v in vt)
    ):
        if isinstance(keys, jax.core.Tracer) or any(
            isinstance(v, jax.core.Tracer) for v in vt
        ):
            raise NotImplementedError(
                "64-bit operands inside jit require the plane interface "
                "(sort_planes); the host bitcast boundary needs concrete "
                "arrays"
            )
        return _sort_64bit_boundary(
            keys, vt, had, single, kd, descending=descending,
            begin_bit=begin_bit, end_bit=end_bit, algorithm=algorithm,
            stable=stable,
        )
    # validate BEFORE choosing a dispatch path: the host-tiered route must
    # reject exactly what _sort_impl rejects (a 2-D input would otherwise
    # be silently column-"sorted" by the reference tier)
    keys = jnp.asarray(keys)
    if keys.ndim != 1:
        raise NotImplementedError("tpusort currently sorts 1-D arrays")
    total_bits = _dtypes.key_bits(keys.dtype)
    eb_chk = total_bits if end_bit is None else end_bit
    if not (0 <= begin_bit < eb_chk <= total_bits):
        raise ValueError(
            f"invalid bit range [{begin_bit}, {eb_chk}) for {keys.dtype}"
        )
    # resolve the tuning config OUTSIDE the jit boundary (it is a static
    # argument): registry updates then retrace instead of being shadowed by
    # the trace cache
    cfg = _configs.get_config(total_bits, had)
    if _host_tiered_applicable(keys, vt, algorithm, cfg):
        out_keys, out_vals = _sort_host_tiered(
            keys, vt, descending=descending, begin_bit=begin_bit,
            end_bit=end_bit,
            stable=(stable and algorithm != "msd_unstable"), cfg=cfg,
        )
        if not had:
            return out_keys
        return out_keys, (out_vals[0] if single else out_vals)
    out_keys, out_vals = _sort_impl(
        keys,
        vt,
        descending=descending,
        begin_bit=begin_bit,
        end_bit=end_bit,
        algorithm=algorithm,
        dimension=0,
        stable=stable,
        cfg=cfg,
    )
    if not had:
        return out_keys
    return out_keys, (out_vals[0] if single else out_vals)


@functools.partial(jax.jit, static_argnames=("descending",))
def _argsort_twiddle_impl(k, descending):
    planes, _ = _dtypes.twiddle_in(k, descending=descending)
    return planes[0]


def argsort(
    keys: jax.Array,
    *,
    descending: bool = False,
    begin_bit: int = 0,
    end_bit: Optional[int] = None,
    algorithm: str = "auto",
):
    """Indices that stably sort ``keys``.

    Full-range 32-bit sorts ride the composite (twiddled key || index)
    2-plane raw path directly: the index plane is simultaneously the
    stable tiebreak and the requested output, so the network carries TWO
    operands instead of the stable-pairs path's three (the composite key
    planes plus a payload) — the dominant cost of the compare-exchange
    chain is per-operand selects.  Sub-range/bit-window argsorts delegate
    to the stable pairs path.
    """
    idx = jnp.arange(keys.shape[0], dtype=jnp.uint32)
    total = _dtypes.key_bits(keys.dtype)
    eb = total if end_bit is None else end_bit
    if begin_bit == 0 and eb == total == 32 and \
            algorithm in ("auto", "msd", "lsd"):
        tw = _argsort_twiddle_impl(keys, descending)
        out = sort_planes(
            (tw, idx), key_dtype="uint64", stable=False,
            algorithm=algorithm,
        )
        return out[1]
    _, perm = sort(
        keys,
        idx,
        descending=descending,
        begin_bit=begin_bit,
        end_bit=end_bit,
        algorithm=algorithm,
    )
    return perm


# CUB-flavored convenience wrappers (device_radix_sort.cuh:147-660)


def sort_keys(keys, **kw):
    return sort(keys, **kw)


def sort_keys_descending(keys, **kw):
    return sort(keys, descending=True, **kw)


def sort_pairs(keys, values, **kw):
    return sort(keys, values, **kw)


def sort_pairs_descending(keys, values, **kw):
    return sort(keys, values, descending=True, **kw)


# MSB-flavored unstable entry points (rdxsrt_unstable_sort_keys/pairs,
# msb/src/sort/gpu_radix_sort.h:511-587)


def unstable_sort_keys(keys, **kw):
    return sort(keys, stable=False, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("key_dtype", "descending", "begin_bit", "end_bit",
                     "algorithm", "stable", "cfg"),
)
def _sort_planes_impl(planes, values_tuple, *, key_dtype, descending,
                      begin_bit, end_bit, algorithm, stable, cfg=None):
    traits = _dtypes.traits_for(key_dtype)
    if len(planes) != traits.planes:
        raise ValueError(
            f"{key_dtype} expects {traits.planes} uint32 plane(s), "
            f"got {len(planes)}"
        )
    tw = _dtypes.twiddle_planes_in(
        tuple(jnp.asarray(p).view(jnp.uint32) for p in planes),
        traits, descending=descending,
    )
    total_bits = traits.bits
    eb = total_bits if end_bit is None else end_bit
    if not (0 <= begin_bit < eb <= total_bits):
        raise ValueError(f"invalid bit range [{begin_bit}, {eb})")
    if cfg is None:
        cfg = _configs.get_config(total_bits, bool(values_tuple))
    if not stable and algorithm in ("auto", "msd", "lsd") and \
            "msd_unstable" in _ENGINES:
        algorithm = "msd_unstable"
    engine = _resolve_engine(algorithm, cfg)
    sp, sv = _call_engine(
        engine, tw, values_tuple, begin_bit=begin_bit, end_bit=eb,
        total_bits=total_bits, config=cfg,
    )
    out = _dtypes.twiddle_planes_out(sp, traits, descending=descending)
    return tuple(out), sv


@functools.partial(
    jax.jit,
    static_argnames=("key_dtype", "descending", "begin_bit", "end_bit",
                     "tier", "stable", "cfg", "mode"),
)
def _sort_planes_tier_impl(planes, values_tuple, *, key_dtype, descending,
                           begin_bit, end_bit, tier, stable, cfg,
                           mode: str = "flag"):
    from tpusort.ops.equidepth import sort_twiddled_equidepth
    from tpusort.ops.msd import sort_twiddled_msd

    traits = _dtypes.traits_for(key_dtype)
    tw = _dtypes.twiddle_planes_in(
        tuple(jnp.asarray(p).view(jnp.uint32) for p in planes),
        traits, descending=descending,
    )
    total_bits = traits.bits
    eb = total_bits if end_bit is None else end_bit
    ovf = jnp.asarray(False)
    if tier == "radix" and mode == "cond":
        sp, sv = sort_twiddled_msd(
            tw, values_tuple, begin_bit=begin_bit, end_bit=eb,
            total_bits=total_bits, stable=stable, on_overflow="cond",
            config=cfg,
        )
    elif tier == "radix":
        sp, sv, ovf = sort_twiddled_msd(
            tw, values_tuple, begin_bit=begin_bit, end_bit=eb,
            total_bits=total_bits, stable=stable, on_overflow="flag",
            skew_tier=False, config=cfg,
        )
    elif tier == "equidepth":
        sp, sv, ovf = sort_twiddled_equidepth(
            tw, values_tuple, begin_bit=begin_bit, end_bit=eb,
            total_bits=total_bits, stable=stable, on_overflow="flag",
            config=cfg,
        )
    else:
        sp, sv = sort_twiddled_reference(
            tw, values_tuple, begin_bit=begin_bit, end_bit=eb,
            total_bits=total_bits,
        )
    out = _dtypes.twiddle_planes_out(sp, traits, descending=descending)
    return tuple(out), sv, ovf


def sort_planes(
    planes,
    values=None,
    *,
    key_dtype: str = "uint64",
    descending: bool = False,
    begin_bit: int = 0,
    end_bit: Optional[int] = None,
    algorithm: str = "auto",
    stable: bool = True,
):
    """Sort keys supplied as raw uint32 bit-pattern planes — the TPU-native
    64-bit interface.

    TPU vector units are 32-bit and this backend cannot materialize 64-bit
    arrays at all, so 64-bit keys live as ``(hi, lo)`` uint32 planes end to
    end (plane 0 = most-significant word).  ``key_dtype`` names the logical
    key type (uint64/int64/float64 — or the 32-bit types with one plane) and
    selects the order-preserving twiddle.  Returns the sorted planes (and
    values, if given).  The 64-bit analog of the reference's templated
    ``rdxsrt_unstable_sort<KeyT>`` 64-bit instantiations
    (``msb/src/sort/gpu_radix_sort.h:190-205``).
    """
    vt, had, single = _normalize_values(values)
    traits_chk = _dtypes.traits_for(key_dtype)
    if len(planes) != traits_chk.planes:
        raise ValueError(
            f"{key_dtype} expects {traits_chk.planes} uint32 plane(s), "
            f"got {len(planes)}"
        )
    eb_chk = traits_chk.bits if end_bit is None else end_bit
    if not (0 <= begin_bit < eb_chk <= traits_chk.bits):
        raise ValueError(f"invalid bit range [{begin_bit}, {eb_chk})")
    cfg = _configs.get_config(traits_chk.bits, had)
    if _host_tiered_applicable(planes[0], vt, algorithm, cfg):
        from tpusort import planner

        kw = dict(key_dtype=key_dtype, descending=descending,
                  begin_bit=begin_bit, end_bit=end_bit,
                  stable=(stable and algorithm != "msd_unstable"), cfg=cfg)
        pt = tuple(planes)
        n_pl = np.shape(pt[0])[0]
        tb_pl = _dtypes.traits_for(key_dtype).bits
        eb_pl = tb_pl if end_bit is None else end_bit

        def dispatch(tier, mode):
            return _sort_planes_tier_impl(pt, vt, tier=tier, mode=mode,
                                          **kw)

        def identity():
            # match the normal path's output type exactly (uint32 jax
            # arrays), whatever array-likes the caller passed
            out_id = tuple(jnp.asarray(p).view(jnp.uint32) for p in pt)
            return out_id, tuple(jnp.asarray(v) for v in vt)

        def decide(sample):
            presorted = planner.predict_presorted([sample])
            tier = "radix"
            if "equidepth" in _tier_chain(cfg) and _skip_radix_tier(
                    sample, n_pl, begin_bit, end_bit, tb_pl, cfg):
                tier = "equidepth"
            return presorted, tier

        classify = None
        if begin_bit == 0 and eb_pl == tb_pl and \
                n_pl >= planner.PLANNER_MIN_N:
            stride = max(1, n_pl // planner.SAMPLE_TARGET)
            classify = (
                _planner_sample_planes_impl(pt, stride, key_dtype,
                                            descending),
                lambda: _is_sorted_planes_impl(pt, key_dtype, descending),
            )
        ckey = ("p", n_pl, key_dtype,
                tuple(str(getattr(v, "dtype", "?")) for v in vt), descending,
                kw["stable"], begin_bit, eb_pl, cfg)
        out_planes, out_vals = _tiered_flow(
            ckey, n_pl, len(pt) + len(vt), classify, decide, cfg,
            dispatch, identity)
        if not had:
            return out_planes
        return out_planes, (out_vals[0] if single else out_vals)
    out_planes, out_vals = _sort_planes_impl(
        tuple(planes), vt, key_dtype=key_dtype, descending=descending,
        begin_bit=begin_bit, end_bit=end_bit, algorithm=algorithm,
        stable=stable, cfg=cfg,
    )
    if not had:
        return out_planes
    return out_planes, (out_vals[0] if single else out_vals)


def unstable_sort_pairs(keys, values, **kw):
    return sort(keys, values, stable=False, **kw)


@functools.partial(
    jax.jit, static_argnames=("num_lsb_bytes", "descending")
)
def _lsb_in_value_impl(keys, values, *, num_lsb_bytes: int,
                       descending: bool):
    from tpusort.ops.msd import sort_twiddled_msd

    planes, traits = _dtypes.twiddle_in(keys, descending=False)
    if traits.planes != 1:
        raise NotImplementedError(
            "lsb-in-value needs a free plane slot: 32-bit key dtypes only"
        )
    v_u32 = jnp.asarray(values).view(jnp.uint32)
    mask = jnp.uint32((1 << (8 * num_lsb_bytes)) - 1) \
        if num_lsb_bytes < 4 else jnp.uint32(0xFFFFFFFF)
    comp = [planes[0], v_u32 & mask]
    if descending:
        comp = [~p for p in comp]
    sp, sv = sort_twiddled_msd(
        tuple(comp), (v_u32,), begin_bit=0, end_bit=64, total_bits=64,
        stable=False,
    )
    k_plane = ~sp[0] if descending else sp[0]
    out_keys = _dtypes.twiddle_out((k_plane,), traits, descending=False,
                                   dtype=keys.dtype)
    return out_keys, sv[0].view(jnp.asarray(values).dtype)


def sort_pairs_lsb_in_value(
    keys, values, num_lsb_bytes: int = 4, *, descending: bool = False
):
    """Unstable pair sort by the composite key (key || low
    ``num_lsb_bytes`` bytes of the value).

    The analog of the reference's ``NUM_LSB_IN_VALUE`` capability
    (``msb/src/sort/gpu_radix_sort.h:195-206,367-368``: low-order key bytes
    stored in the value word, sorted via the pointer-swap trick).  Here the
    masked value bytes simply ride as the second key plane of the raw
    2-plane network, and the full value is carried as payload.
    """
    if not 1 <= num_lsb_bytes <= 4:
        raise ValueError("num_lsb_bytes must be in 1..4")
    if jnp.dtype(jnp.asarray(values).dtype).itemsize != 4:
        raise ValueError("values must be a 32-bit dtype")
    return _lsb_in_value_impl(
        keys, values, num_lsb_bytes=num_lsb_bytes, descending=descending
    )
