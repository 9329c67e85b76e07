import time, faulthandler, jax, jax.numpy as jnp, numpy as np
faulthandler.dump_traceback_later(3600, exit=True)
from tpusort.ops import msd
from tpusort import dtypes as td

N = 1 << 26
keys = jax.random.bits(jax.random.key(0), (N,), dtype=jnp.uint32)
planes, traits = td.twiddle_in(keys)

@jax.jit
def _probe(o): return jax.tree.leaves(o)[0].ravel()[:8]
def _sync(o): return np.asarray(_probe(o))

pk = dict(k=1 << 15, s1=1280, s=1024)
plan = msd.plan_msd(N, 0, 32, **pk)
print("k32 plan:", plan and [(s.n_seg, s.t_seg, s.k, s.r, s.s)
      for s in plan.passes], "seg", plan and plan.seg, flush=True)

for name, kw in (("default", None), ("k32", pk)):
    f = jax.jit(lambda p, kw=kw: msd.sort_twiddled_msd(
        (p,), (), begin_bit=0, end_bit=32, total_bits=32,
        plan_kwargs=kw, on_overflow="flag")[::2])
    _sync(f(planes[0]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); _sync(f(planes[0])); ts.append(time.perf_counter()-t0)
    (sp,), ovf = f(planes[0])
    got = np.asarray(sp)
    ok = np.array_equal(got, np.sort(np.asarray(keys)))
    print(f"{name:8s} {min(ts)*1e3:8.1f} ms {N/min(ts)/1e6:6.0f} M/s "
          f"overflow={bool(ovf)} exact={ok}", flush=True)
