"""Component-level probes for the partition-pass cost model.

Each probe isolates one ingredient of a radix pass so the pass's fixed
overhead (starts/counts/emit) can be separated from the compare-exchange
network cost.  Run probes individually (they are separate compile units;
keep them small so a wedged remote-compile service can't eat the session):

    python benchmarks/stage_probe.py network --log2n 26
    python benchmarks/stage_probe.py merge --log2n 26
    python benchmarks/stage_probe.py pass_full --log2n 26
    python benchmarks/stage_probe.py starts --r 32
    python benchmarks/stage_probe.py matmul --dtype bf16
    python benchmarks/stage_probe.py gather
"""

from __future__ import annotations

import argparse
import functools
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusort.kernels.bitonic import (
    LANES, _merge_sorted_runs, _sort_network,
)
from tpusort.utils import timing


def _report(name, dt, n_items, unit="elem"):
    print(f"{name}: {dt*1e3:9.3f} ms -> {n_items/dt/1e9:8.3f} G{unit}/s")


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _scaled(t: int, small: int = 4) -> int:
    """Probe tile count: full on TPU, tiny for off-TPU interpret checks."""
    return t if _on_tpu() else small


def _measure(f, *args):
    """Time on TPU; off-TPU just run once (correctness smoke)."""
    if _on_tpu():
        return timing.measure(f, *args, iters=3)
    f(*args)
    return float("nan")


def probe_roll(axis_name: str, dist: int = 1, nb: int = 4):
    """Cost of one pltpu.roll along lanes vs sublanes — the network's
    per-stage cost is dominated by partner moves, and if lane rolls are
    much dearer than sublane rolls, swapping which index bits live on
    which axis reorders 77 of 105 stages onto the cheap axis."""
    rows = 128
    T, reps = _scaled(512, nb), 64
    axis = 2 if axis_name == "lane" else 1

    def kern(x_ref, o_ref):
        x = x_ref[...]
        for i in range(reps):
            x = pltpu.roll(x, dist, axis=axis) ^ jnp.uint32(i)
        o_ref[...] = x

    spec = pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, rows, LANES), jnp.uint32),
        grid=(T // nb,),
        in_specs=[spec], out_specs=spec,
    )
    x = jax.random.bits(jax.random.key(0), (T, rows, LANES), dtype=jnp.uint32)
    dt = _measure(f, x)
    n_ops = T * rows * LANES * reps
    print(f"roll {axis_name} d={dist}: {dt*1e3:.3f} ms -> "
          f"{dt/reps*1e6:.2f} us/roll-pass ({n_ops/dt/1e9:.1f} G elem-roll/s)")


def probe_transpose(nb: int = 4):
    """In-kernel (128,128) transpose cost (XLU / Mosaic-native) — cheap
    transposes let the network's lane-level stages run as sublane stages."""
    rows = 128
    T, reps = _scaled(512, nb), 16

    def kern(x_ref, o_ref):
        for b in range(nb):
            x = x_ref[b]
            for i in range(reps):
                x = x.T ^ jnp.uint32(i)
            o_ref[b] = x

    spec = pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, rows, LANES), jnp.uint32),
        grid=(T // nb,),
        in_specs=[spec], out_specs=spec,
    )
    x = jax.random.bits(jax.random.key(0), (T, rows, LANES), dtype=jnp.uint32)
    try:
        dt = _measure(f, x)
        print(f"transpose 128x128: {dt/(T*reps)*1e9:.1f} ns/transpose "
              f"({T*rows*LANES*reps/dt/1e9:.1f} G elem/s)")
    except Exception as e:
        print(f"transpose: FAIL {type(e).__name__}: {str(e)[:160]}")


def _bit_swapped(shape, bit: int):
    """Like bitonic._bit but for the SWAPPED element mapping
    i = lane*ROWS + row: fine bits live on the sublane axis."""
    rows = shape[-2]
    rb = rows.bit_length() - 1
    if bit < rb:
        ids = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
        return (ids >> bit) & 1
    ids = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return (ids >> (bit - rb)) & 1


def _partner_swapped(x, j: int):
    rows = x.shape[-2]
    rb = rows.bit_length() - 1
    d = 1 << j
    if d < rows:
        axis, dist = x.ndim - 2, d
    else:
        axis, dist = x.ndim - 1, d >> rb
    size = x.shape[axis]
    fwd = pltpu.roll(x, size - dist, axis=axis)
    bwd = pltpu.roll(x, dist, axis=axis)
    return jnp.where(_bit_swapped(x.shape, j) == 1, bwd, fwd)


def probe_network_swapped(log2n: int, k: int, nb: int, merge_from: int = 0):
    """The full bitonic sort with the swapped index mapping (i = lane*ROWS
    + row): stages j<7 roll SUBLANES instead of lanes — 77 of 105 stages
    move to the cheap axis if sublane rolls are cheaper.  Measures the
    same stage count as probe_network; output order differs (swapped
    linear order) but per-stage work is identical."""
    n = 1 << log2n
    T = _scaled(n // k)
    n = T * k
    rows = k // LANES

    def _cmp_sw(arrays, j, kk):
        key = arrays[0]
        partners = [_partner_swapped(a, j) for a in arrays]
        fwd_dir = _bit_swapped(key.shape, j) == _bit_swapped(key.shape, kk + 1)
        a = jnp.where(fwd_dir, key, partners[0])
        b = jnp.where(fwd_dir, partners[0], key)
        take = jnp.where(a <= b, jnp.int32(1), jnp.int32(0)) == 1
        return [jnp.where(take, x, px) for x, px in zip(arrays, partners)]

    def kern(x_ref, o_ref):
        x = [x_ref[...]]
        n_bits = k.bit_length() - 1
        k0 = merge_from.bit_length() - 1 if merge_from else 0
        for kk in range(k0, n_bits):
            for j in range(kk, -1, -1):
                x = _cmp_sw(x, j, kk)
        o_ref[...] = x[0]

    spec = pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, rows, LANES), jnp.uint32),
        grid=(T // nb,),
        in_specs=[spec], out_specs=spec,
    )
    x = jax.random.bits(jax.random.key(0), (T, rows, LANES), dtype=jnp.uint32)
    dt = _measure(f, x)
    lgk = k.bit_length() - 1
    if merge_from:
        k0 = merge_from.bit_length() - 1
        stages = sum(range(k0 + 1, lgk + 1))
    else:
        stages = lgk * (lgk + 1) // 2
    _report(f"network_swapped k={k} nb={nb} merge_from={merge_from} "
            f"({stages} stages)", dt, n)
    print(f"  per-stage: {dt/stages*1e3:.4f} ms "
          f"({dt/stages/n*1e12:.3f} ps/elem/stage)")
    if not _on_tpu() and not merge_from:
        # correctness smoke: swapped-linear order == sorted after unswap
        got = np.asarray(f(x))[0]
        un = got.transpose(1, 0).reshape(-1)  # (lane, row) -> linear
        assert np.all(np.diff(un.astype(np.int64)) >= 0), "swapped sort broken"
        print("  swapped order check: ok")


def probe_network(log2n: int, k: int, nb: int, merge_from: int = 0,
                  dtype_name: str = "u32", n_ops: int = 1,
                  num_keys: int = 1):
    """Pure bitonic sort (or merge) kernel over (T, K) tiles.

    ``--ops N``: N operands ride the network (op 0 the key unless
    ``--num-keys`` > 1 for lexicographic multi-plane keys) — the stable
    pairs / u64 cost shape.  ``--dtype u16``: same network on uint16
    vregs (does not lower on v5e: Mosaic cannot roll 16-bit vregs)."""
    n = 1 << log2n
    T = _scaled(n // k)
    n = T * k
    rows = k // LANES
    dt_map = {"u32": jnp.uint32, "u16": jnp.uint16, "s16": jnp.int16}
    dt_el = dt_map[dtype_name]

    def kern(*refs):
        ins, outs = refs[:n_ops], refs[n_ops:]
        x = [r[...] for r in ins]
        if merge_from:
            x = _merge_sorted_runs(x, merge_from, num_keys=num_keys)
        else:
            x = _sort_network(x, num_keys=num_keys)
        for o, a in zip(outs, x):
            o[...] = a

    spec = pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((T, rows, LANES), dt_el)
                   for _ in range(n_ops)],
        grid=(T // nb,),
        in_specs=[spec] * n_ops, out_specs=[spec] * n_ops,
    )
    x = jax.random.bits(jax.random.key(0), (T, rows, LANES), dtype=jnp.uint32)
    if dt_el != jnp.uint32:
        x = (x >> jnp.uint32(16)).astype(dt_el)
    if merge_from:
        xs = x.reshape(T, -1, merge_from)
        x = jax.lax.sort(xs, dimension=2).reshape(T, rows, LANES)
    ops = [x] + [
        jax.random.bits(jax.random.key(i + 1), (T, rows, LANES),
                        dtype=jnp.uint32).astype(dt_el)
        for i in range(n_ops - 1)
    ]
    dt = _measure(f, *ops)
    lgk = k.bit_length() - 1
    if merge_from:
        k0 = merge_from.bit_length() - 1
        stages = sum(range(k0 + 1, lgk + 1))
    else:
        stages = lgk * (lgk + 1) // 2
    _report(f"{'merge' if merge_from else 'sort'} k={k} nb={nb} "
            f"ops={n_ops} keys={num_keys} {dtype_name} ({stages} stages)",
            dt, n)
    print(f"  per-stage: {dt/stages*1e3:.4f} ms "
          f"({dt/stages/n*1e12:.3f} ps/elem/stage)")


def probe_pass_full(log2n: int, r: int = 32,
                    s: int = 0, k: int = 1 << 14, nb: int = 4):
    """The production fused partition pass at production geometry."""
    from tpusort.kernels.partition import partition_pass_fused

    n = 1 << log2n
    if not s:
        s = ((3 * k // (2 * r)) // 128) * 128
    width = r.bit_length() - 1
    T = _scaled(n // k)
    n = T * k
    keys = jax.random.bits(jax.random.key(0), (T, k), dtype=jnp.uint32)

    def fn(keys):
        data, counts = partition_pass_fused(
            [keys], [], None, r=r, s=s, lo_bit=32 - width, width=width,
            n=n, t_seg=T, batch=nb,
            interpret=False,
        )
        return data[0], counts

    dt = _measure(fn, keys)
    _report(f"pass_full k={k} r={r} s={s} nb={nb}", dt, n)


def probe_starts(r: int, variant: str, iters_in_kernel: int = 8):
    """Starts/counts computation cost, isolated: full-tile reduces
    (today's) vs row-hierarchical (row-last vector + one-row residual)."""
    k = 1 << 14
    rows = k // LANES
    T = _scaled(512)
    nb = 4
    width = r.bit_length() - 1

    def kern(x_ref, o_ref):
        x = x_ref[...]
        digit = x >> jnp.uint32(32 - width)
        total = jnp.zeros((), jnp.int32)
        for _ in range(iters_in_kernel):
            for b in range(nb):
                db = digit[b]
                if variant == "full":
                    for d in range(1, r):
                        total += jnp.sum(
                            (db < jnp.uint32(d)).astype(jnp.int32))
                else:
                    row_last = db[:, LANES - 1 : LANES]  # (rows, 1)
                    for d in range(1, r):
                        rb = jnp.sum(
                            (row_last < jnp.uint32(d)).astype(jnp.int32))
                        total += rb
            digit = digit ^ jnp.uint32(total & 1)
        o_ref[0, 0, 0] = total

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T // nb, 1, r), jnp.int32),
        grid=(T // nb,),
        in_specs=[pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, r), lambda t: (t, 0, 0),
                               memory_space=pltpu.SMEM),
    )
    x = jax.random.bits(jax.random.key(0), (T, rows, LANES), dtype=jnp.uint32)
    dt = _measure(f, x)
    per_pass = dt / iters_in_kernel
    _report(f"starts[{variant}] r={r} (per pass-equivalent)", per_pass,
            T * k)


def probe_matmul(dtype_name: str):
    dt_map = {"bf16": jnp.bfloat16, "f32": jnp.float32, "s8": jnp.int8}
    dt_in = dt_map[dtype_name]
    acc = jnp.int32 if dtype_name == "s8" else jnp.float32
    m = k = n2 = 256
    reps = 16

    def kern(a_ref, b_ref, o_ref):
        a, b = a_ref[...], b_ref[...]
        o = jnp.zeros((m, n2), acc)
        for _ in range(reps):
            o = o + jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc)
            # perturb so the loop can't collapse to one matmul; int8 vector
            # add doesn't lower in Mosaic, xor does
            a = a ^ jnp.int8(1) if dtype_name == "s8" else a + a
        o_ref[...] = o

    # big grid so compute dwarfs the ~28 ms tunnel-sync noise floor
    G = 4096 if _on_tpu() else 4
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n2), acc),
        grid=(G,),
        in_specs=[pl.BlockSpec((m, k), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, n2), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m, n2), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    a = jnp.ones((m, k), dt_in)
    b = jnp.ones((k, n2), dt_in)
    dt = _measure(f, a, b)
    macs = G * reps * m * k * n2
    print(f"matmul {dtype_name}: {dt*1e3:.3f} ms -> "
          f"{macs/dt/1e12:.2f} T MAC/s")


from tpusort.kernels.scanhist import (       # noqa: E402
    cumsum_lanes as _cumsum_lanes,
    cumsum_sublanes as _cumsum_sublanes,
)


def probe_rankdest(r: int, nb: int = 4, check: bool = False):
    """Counting-rank destination computation WITHOUT apply: per-element
    padded-output destination d*S + cross_row_prefix + within_row_rank via
    R masked log-shift cumsums (no sort network, no MXU).  If this runs
    much cheaper than the sort network, the remaining blocker for a
    counting pass is only the apply/permute step (see thin_mm / gather)."""
    k = 1 << 14
    rows = k // LANES
    T = _scaled(256, nb)
    width = r.bit_length() - 1

    def kern(x_ref, o_ref):
        x = x_ref[...]
        for b in range(nb):
            d = x[b] >> jnp.uint32(32 - width)
            dest = jnp.zeros((rows, LANES), jnp.int32)
            rs = jnp.zeros((), jnp.int32)
            for rr in range(r):
                m = (d == jnp.uint32(rr)).astype(jnp.int32)
                pc = _cumsum_lanes(m) - m          # excl. within row
                rowtot = pc[:, LANES - 1 : LANES] + m[:, LANES - 1 : LANES]
                rows_excl = _cumsum_sublanes(rowtot) - rowtot  # (rows,1)
                dest = jnp.where(m == 1, rs + rows_excl + pc, dest)
                rs = rs + jnp.sum(m)
            o_ref[b] = dest

    spec = pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, rows, LANES), jnp.int32),
        grid=(T // nb,),
        in_specs=[spec], out_specs=spec,
    )
    x = jax.random.bits(jax.random.key(0), (T, rows, LANES), dtype=jnp.uint32)
    if check:
        got = np.asarray(f(x))[0]
        dd = np.asarray(x)[0].reshape(-1) >> (32 - width)
        want = np.zeros_like(dd, dtype=np.int64)
        off = 0
        for rr in range(r):
            sel = dd == rr
            want[sel] = off + np.arange(sel.sum())
            off += int(sel.sum())
        print("rankdest check:", np.array_equal(want, got.reshape(-1)))
    dt = _measure(f, x)
    _report(f"rankdest r={r} nb={nb}", dt, T * k)


def probe_thin_mm(w: int):
    """(128,128) @ (128,w) matmul issue rate — the cost model for one-hot
    chunk permutes (permuted_chunk = Q @ X, X = w columns of 16-bit halves
    as f32).  Viable only if Mosaic pipelines thin matmuls well."""
    reps = 256

    def kern(q_ref, x_ref, o_ref):
        q, x = q_ref[...], x_ref[...]
        acc = jnp.zeros((LANES, w), jnp.float32)
        for _ in range(reps):
            acc = acc + jax.lax.dot_general(
                q, x, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            x = x + jnp.float32(1.0)
        o_ref[...] = acc

    G = 2048 if _on_tpu() else 4
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((LANES, w), jnp.float32),
        grid=(G,),
        in_specs=[pl.BlockSpec((LANES, LANES), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((LANES, w), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((LANES, w), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    q = jnp.eye(LANES, dtype=jnp.float32)
    x = jnp.ones((LANES, w), jnp.float32)
    dt = _measure(f, q, x)
    n_mm = G * reps
    print(f"thin_mm w={w}: {dt*1e3:.3f} ms -> {dt/n_mm*1e9:.1f} ns/matmul "
          f"({n_mm*LANES*LANES*w/dt/1e12:.3f} T MAC/s)")


def probe_batch_mm(w: int):
    """Batched (b,128,128)@(b,128,w) dot_general — does Mosaic lower batch
    dims, and at what rate?  Decides whether 128 per-chunk one-hot
    permutes can issue as one op instead of a Python loop."""
    b = 128

    def kern(q_ref, x_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            q_ref[...], x_ref[...],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    G = 1024 if _on_tpu() else 4
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, LANES, w), jnp.float32),
        grid=(G,),
        in_specs=[pl.BlockSpec((b, LANES, LANES), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((b, LANES, w), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b, LANES, w), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    q = jnp.broadcast_to(jnp.eye(LANES, dtype=jnp.float32),
                         (b, LANES, LANES))
    x = jnp.ones((b, LANES, w), jnp.float32)
    try:
        dt = _measure(f, q, x)
    except Exception as e:
        print(f"batch_mm w={w}: FAIL {type(e).__name__}: {str(e)[:160]}")
        return
    n_mm = G * b
    print(f"batch_mm w={w}: {dt*1e3:.3f} ms -> {dt/n_mm*1e9:.1f} ns/matmul "
          f"({n_mm*LANES*LANES*w/dt/1e12:.3f} T MAC/s)")


def probe_rowperm_mm(check: bool = False):
    """Data-dependent SUBLANE (row-level) permutation via one-hot matmul:
    out = Q @ X with Q[i,j] = (destrow[j] == i), built in-kernel from a
    (1,128) dest vector with iota compares — no gather.  Row-granular
    permutes are ~128 MACs/elem if this lowers; lane-granular movement
    stays the hard part."""
    rows = LANES
    nb = 4
    T, reps = _scaled(256, nb), 8

    def kern(x_ref, d_ref, o_ref):
        for b in range(nb):
            # Mosaic has no direct u32->f32 cast; inputs are int32
            x = x_ref[b].astype(jnp.float32)
            dest = d_ref[b]                        # (1, 128) target rows
            for _ in range(reps):
                q = (jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
                     == dest).astype(jnp.float32)
                x = jax.lax.dot_general(
                    q, x, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[b] = x.astype(jnp.int32)

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, rows, LANES), jnp.int32),
        grid=(T // nb,),
        in_specs=[
            pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    x = jax.random.randint(jax.random.key(0), (T, rows, LANES), 0, 1 << 22,
                           jnp.int32)
    perm = np.stack([np.random.default_rng(i).permutation(LANES)
                     for i in range(T)]).astype(np.int32)[:, None, :]
    d = jnp.asarray(perm)
    if check:
        got = np.asarray(f(x, d))[0]
        ref = np.asarray(x)[0]
        for _ in range(reps):
            out = np.zeros_like(ref)
            out[perm[0, 0]] = ref
            ref = out
        print("rowperm check:", np.array_equal(got, ref))
    dt = _measure(f, x, d)
    _report("rowperm_mm (per permute)", dt / reps, T * rows * LANES)


def probe_dynstore(w_rows: int = 2, check: bool = False):
    """Stores at dynamic sublane offsets into the output ref — the pooled
    per-(grid-step,digit) emit needs out[pl.ds(dyn_off, W)] = window."""
    rows = 128
    nb = 4
    T, nwin = _scaled(256, nb), 64

    def kern(x_ref, off_ref, o_ref):
        for b in range(nb):
            x = x_ref[b]
            o_ref[b, : rows] = x                 # baseline fill
            # pad rows [rows, rows+w_rows) are only partially reachable by
            # the dynamic stores (off <= rows-1 covers at most row
            # rows+w_rows-2) — fill them deterministically so --check never
            # compares uninitialized VMEM against the zero-filled reference
            o_ref[b, rows:, :] = x[:w_rows]
            for i in range(nwin):
                off = off_ref[b, 0, i]
                win = x[i * 2 : i * 2 + w_rows, :]
                o_ref[b, pl.ds(off, w_rows), :] = win

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, rows + w_rows, LANES),
                                       jnp.uint32),
        grid=(T // nb,),
        in_specs=[
            pl.BlockSpec((nb, rows, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, nwin), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((nb, rows + w_rows, LANES),
                               lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    x = jax.random.bits(jax.random.key(0), (T, rows, LANES), dtype=jnp.uint32)
    offs = np.random.default_rng(0).integers(
        0, rows, size=(T, 1, nwin)).astype(np.int32)
    o = jnp.asarray(offs)
    if check:
        got = np.asarray(f(x, o))[0]
        ref = np.zeros((rows + w_rows, LANES), np.uint32)
        ref[:rows] = np.asarray(x)[0]
        ref[rows:] = np.asarray(x)[0][:w_rows]
        for i in range(nwin):
            ref[offs[0, 0, i] : offs[0, 0, i] + w_rows] = np.asarray(
                x)[0][i * 2 : i * 2 + w_rows]
        print("dynstore check:", np.array_equal(got, ref))
    dt = _measure(f, x, o)
    print(f"dynstore w={w_rows}: {dt*1e3:.3f} ms -> "
          f"{dt/(T*nwin)*1e9:.1f} ns/window")


def probe_gather_wide():
    """Cross-vreg lane gather: take_along_axis over a (B, 16384) row —
    what a sortkey-sort + payload-gather tile path would need (indices
    span 128 vregs, not one).  Block shape (8, K) satisfies Mosaic's
    (8, 128) divisibility rule (round 2's (4, K) spec could never lower,
    so the gather itself was never actually probed)."""
    B, K, reps = 16, 1 << 14, 2

    def kern(x_ref, i_ref, o_ref):
        x, idx = x_ref[...], i_ref[...]
        for _ in range(reps):
            x = jnp.take_along_axis(x, idx, axis=1)
        o_ref[...] = x

    spec = pl.BlockSpec((8, K), lambda t: (t, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.int32),
        grid=(B // 8,),
        in_specs=[spec, spec], out_specs=spec,
    )
    x = jax.random.randint(jax.random.key(0), (B, K), 0, 1 << 30, jnp.int32)
    idx = jax.random.randint(jax.random.key(1), (B, K), 0, K, jnp.int32)
    try:
        got = np.asarray(f(x, idx))
        ref = x
        for _ in range(reps):
            ref = jnp.take_along_axis(ref, idx, axis=1)
        ok = np.array_equal(got, np.asarray(ref))
        dt = _measure(f, x, idx)
        _report(f"gather_wide K={K} ok={ok}", dt, B * K * reps)
    except Exception as e:
        print(f"gather_wide: FAIL {type(e).__name__}: {str(e)[:160]}")


def probe_gather():
    """Does Mosaic lower take_along_axis at all, and at what granularity?

    2D shapes only (Mosaic: "Only 2D gather is supported").  Three cases:
      * lane gather: (R, 128) indices in [0, 128) along axis=1 — per-row
        permutes within one vreg-width, the building block for subtile
        sortkey apply;
      * sublane gather: (R, 128) indices in [0, R) along axis=0 — cross-row
        movement at fixed lane;
      * wide-row gather (probe_gather_wide): indices span 128 vregs.
    """
    R, T, reps = 512, _scaled(32), 4

    for axis, hi, label in ((1, LANES, "lane"), (0, R, "sublane")):

        def kern(x_ref, i_ref, o_ref, axis=axis):
            x, idx = x_ref[...], i_ref[...]
            for _ in range(reps):
                x = jnp.take_along_axis(x, idx, axis=axis)
            o_ref[...] = x

        spec = pl.BlockSpec((R, LANES), lambda t: (t, 0),
                            memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T * R, LANES), jnp.int32),
            grid=(T,),
            in_specs=[spec, spec], out_specs=spec,
        )
        x = jax.random.randint(jax.random.key(0), (T * R, LANES), 0,
                               1 << 30, jnp.int32)
        idx = jax.random.randint(jax.random.key(1), (T * R, LANES), 0, hi,
                                 jnp.int32)
        try:
            got = np.asarray(f(x, idx))
            ref = x.reshape(T, R, LANES)
            idx3 = idx.reshape(T, R, LANES)
            for _ in range(reps):
                ref = jnp.take_along_axis(ref, idx3, axis=axis + 1)
            ok = np.array_equal(got, np.asarray(ref).reshape(T * R, LANES))
            dt = _measure(f, x, idx)
            _report(f"gather {label} (axis={axis}) ok={ok}", dt,
                    T * R * LANES * reps)
        except Exception as e:
            print(f"gather {label} (axis={axis}): FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}")


def main():
    timing.honor_explicit_cpu()
    # Off-TPU smoke runs (correctness checks only): force interpret mode.
    if jax.default_backend() != "tpu":
        real_call = pl.pallas_call

        def _interp_call(*a, **kw):
            kw["interpret"] = True
            return real_call(*a, **kw)

        pl.pallas_call = _interp_call

    ap = argparse.ArgumentParser()
    ap.add_argument("probe", choices=["network", "merge", "pass_full",
                                      "starts", "starts_rows", "matmul",
                                      "gather", "rankdest", "thin_mm",
                                      "rowperm_mm", "dynstore", "batch_mm",
                                      "roll", "transpose",
                                      "network_swapped", "merge_swapped"])
    ap.add_argument("--axis", default="lane", choices=["lane", "sublane"])
    ap.add_argument("--dist", type=int, default=1)
    ap.add_argument("--ops", type=int, default=1)
    ap.add_argument("--num-keys", type=int, default=1)
    ap.add_argument("--log2n", type=int, default=26)
    ap.add_argument("--k", type=int, default=1 << 14)
    ap.add_argument("--nb", type=int, default=4)
    ap.add_argument("--r", type=int, default=32)
    ap.add_argument("--merge-from", type=int, default=512)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--starts-rows", action="store_true")
    ap.add_argument("--s", type=int, default=0)
    ap.add_argument("--w", type=int, default=2)
    ap.add_argument("--values", type=int, default=1)
    ap.add_argument("--planes", type=int, default=1)
    ap.add_argument("--c", type=int, default=0)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    el_dt = args.dtype if args.dtype in ("u32", "u16", "s16") else "u32"
    if args.probe == "roll":
        probe_roll(args.axis, dist=args.dist, nb=args.nb)
        return
    if args.probe == "transpose":
        probe_transpose(nb=args.nb)
        return
    if args.probe == "network_swapped":
        probe_network_swapped(args.log2n, args.k, args.nb)
        return
    if args.probe == "merge_swapped":
        probe_network_swapped(args.log2n, args.k, args.nb,
                              merge_from=args.merge_from)
        return
    if args.probe == "network":
        probe_network(args.log2n, args.k, args.nb, dtype_name=el_dt,
                      n_ops=args.ops, num_keys=args.num_keys)
    elif args.probe == "merge":
        probe_network(args.log2n, args.k, args.nb,
                      merge_from=args.merge_from, dtype_name=el_dt,
                      n_ops=args.ops, num_keys=args.num_keys)
    elif args.probe == "pass_full":
        probe_pass_full(args.log2n, r=args.r, s=args.s, k=args.k,
                        nb=args.nb)
    elif args.probe == "starts":
        probe_starts(args.r, "full")
    elif args.probe == "starts_rows":
        probe_starts(args.r, "rows")
    elif args.probe == "matmul":
        probe_matmul(args.dtype)
    elif args.probe == "gather":
        probe_gather()
        probe_gather_wide()
    elif args.probe == "rankdest":
        probe_rankdest(args.r, nb=args.nb, check=args.check)
    elif args.probe == "thin_mm":
        probe_thin_mm(args.w)
    elif args.probe == "rowperm_mm":
        probe_rowperm_mm(check=args.check)
    elif args.probe == "dynstore":
        probe_dynstore(w_rows=args.w, check=args.check)
    elif args.probe == "batch_mm":
        probe_batch_mm(args.w)


if __name__ == "__main__":
    main()
