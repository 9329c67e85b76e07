"""Throwaway: stage-by-stage timing of the real MSD pipeline at 2^28."""
import time
import jax, jax.numpy as jnp, numpy as np
from tpusort.ops import msd

N = 1 << 28

@jax.jit
def _probe(o):
    return jax.tree.leaves(o)[0].ravel()[:8]

def _sync(out):
    return np.asarray(_probe(out))

def bench(name, fn, *args, iters=2):
    f = jax.jit(fn)
    _sync(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); _sync(f(*args)); ts.append(time.perf_counter()-t0)
    print(f"{name:40s} {min(ts)*1e3:9.2f} ms")
    return f, min(ts)

plan = msd.plan_msd(N, 0, 32)
print("plan:", [(p.n_seg, p.t_seg, p.k, p.r, p.s) for p in plan.passes],
      "seg", plan.seg, "nseg", plan.n_segments, "m1", plan.m1,
      "mfinal", plan.m_final)

keys = jax.random.bits(jax.random.key(0), (N,), dtype=jnp.uint32)
noop, _ = bench("noop", lambda a: a, keys[:8])

ops = [jnp.pad(keys, (0, plan.m1 - N))]
k0 = plan.passes[0].k
t0n = plan.m1 // k0
run_counts = jnp.clip(N - jnp.arange(t0n, dtype=jnp.int32) * k0, 0, k0)
s_prev = k0

state = (ops, run_counts)
for i, spec in enumerate(plan.passes):
    sp = s_prev
    def pass_fn(ops_, rc_, spec=spec, sp=sp):
        o, rc, ovf = msd._partition_pass(list(ops_), slice(0, 1), rc_, sp,
                                         spec, True)
        return o, rc
    f, dt = bench(f"partition pass {i} (m={state[0][0].shape[0]>>20}M)",
                  pass_fn, state[0], state[1])
    state = f(state[0], state[1])
    s_prev = spec.s

def leaf_fn(ops_, rc_):
    o, sc = msd._leaf_sort(list(ops_), slice(0, 1), rc_, s_prev, plan, True)
    return o, sc
f, dt = bench(f"leaf sort (m={state[0][0].shape[0]>>20}M)",
              leaf_fn, state[0], state[1])
leaf_out = f(state[0], state[1])

from tpusort.kernels.collapse import collapse_segments
def coll_fn(ops_, sc_):
    return collapse_segments(
        [o.reshape(plan.n_segments, plan.seg) for o in ops_], sc_, N)
bench("collapse", coll_fn, leaf_out[0], leaf_out[1])
