"""Pallas remote-DMA all-to-all for the distributed shuffle.

The collective-free realization of the global sort's padded-window
exchange (SURVEY §7 step 5: "first ``lax.all_to_all``, then Pallas
RDMA-overlapped"): every device DMAs its destination-``b`` window
straight into slot ``r`` (its own index) of device ``b``'s receive
buffer over ICI, with per-peer DMA semaphores — no XLA collective, no
intermediate copies, and the issue/wait split exposes the overlap the
reference gets from its 3-stream discipline
(``msb/src/sort/gpu_radix_sort.h:240-257``): all sends are STARTED
before any wait, so every link runs concurrently, and a compute callback
can run between issue and drain.

Addressing is direct (not hop-by-hop): TPU ICI routes remote DMAs to
non-neighbor logical devices through the fabric, so a D-device exchange
is D-1 outstanding DMAs per device — the dense all-to-all traffic
pattern the torus handles natively.  The communication pattern is
symmetric, so each device constructs the same descriptors and waiting on
its own (send, recv) semaphore pair per peer offset is exact.

Validated on the multi-device CPU emulator (``pltpu.InterpretParams``
with race detection) in ``tests/test_distributed.py``; compiled for real
meshes through the same code path.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ring_all_to_all"]


def _a2a_kernel(send_ref, out_ref, send_sem, recv_sem, local_sem, *,
                axis: str, d: int, compute: Optional[Callable] = None):
    my = jax.lax.axis_index(axis)
    # local window: plain device-local DMA, overlapped with the remote ones
    loc = pltpu.make_async_copy(
        send_ref.at[my], out_ref.at[my], local_sem
    )
    loc.start()
    rdmas = []
    for off in range(1, d):
        dst = jax.lax.rem(my + jnp.int32(off), jnp.int32(d))
        rdma = pltpu.make_async_remote_copy(
            src_ref=send_ref.at[dst],   # window destined to device dst
            dst_ref=out_ref.at[my],     # lands at slot = sender's index
            send_sem=send_sem.at[off - 1],
            recv_sem=recv_sem.at[off - 1],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdmas.append(rdma)
    if compute is not None:
        # overlap hook: runs after every transfer is issued, before any
        # wait (the shuffle/compute overlap point)
        compute()
    loc.wait()
    for rdma in rdmas:
        rdma.wait()


def ring_all_to_all(x: jax.Array, axis: str, *, d: int,
                    interpret=None) -> jax.Array:
    """All-to-all of per-shard windows via direct remote DMA.

    ``x``: per-shard (d, window) uint32 under ``shard_map`` over a 1-D
    mesh axis of size ``d`` (window % 128 == 0); returns (d, window)
    where out[s] is shard s's window destined to this shard — the same
    contract as ``jax.lax.all_to_all(x, axis, 0, 0, tiled=False)`` on
    the stacked layout the global sort uses.
    """
    if interpret is None:
        interpret = (
            pltpu.InterpretParams(dma_execution_mode="eager")
            if jax.default_backend() != "tpu" else False
        )
    dd, window = x.shape
    if dd != d or window % 128:
        raise ValueError(f"expected ({d}, k*128) windows, got {x.shape}")
    rows = window // 128
    x3 = x.reshape(d, rows, 128)
    out = pl.pallas_call(
        functools.partial(_a2a_kernel, axis=axis, d=d),
        out_shape=jax.ShapeDtypeStruct((d, rows, 128), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((max(d - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(d - 1, 1),)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=7,
        ),
        interpret=interpret,
    )(x3)
    return out.reshape(d, window)
