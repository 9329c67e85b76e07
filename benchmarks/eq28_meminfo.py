"""Compile-only memory analysis of the equi-depth tier at a given size.

The r5 stage-A drive hit ``TPU backend error (Internal)`` executing the
first-ever equidepth 2^28 row — the r4 experience says such errors are
often VMEM/HBM OOMs with the real message hidden in the remote-compile
HTTP body.  This probe LOWERS AND COMPILES the exact tier graph the host
chain dispatches (flag-mode equidepth) and prints XLA's memory analysis
without executing, separating "graph cannot fit" from "tunnel wedged".

    python benchmarks/eq28_meminfo.py --log2n 28
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

from tpusort import api as _api
from tpusort import configs as _configs
from tpusort.utils import timing


def main():
    timing.honor_explicit_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2n", type=int, default=28)
    ap.add_argument("--run", action="store_true",
                    help="also execute once and report the overflow flag")
    args = ap.parse_args()
    n = 1 << args.log2n

    cfg = _configs.get_config(32, False)
    keys = jax.random.bits(jax.random.key(0), (n,), dtype=jnp.uint32)
    kw = dict(descending=False, begin_bit=0, end_bit=None, stable=True,
              cfg=cfg, tier="equidepth", mode="flag")
    lowered = _api._sort_tier_impl.lower(keys, (), **kw)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print(json.dumps({
        "log2n": args.log2n,
        "tier": "equidepth",
        "peak_gb": round(getattr(ma, "temp_size_in_bytes", 0) / 2**30, 3),
        "args_gb": round(
            getattr(ma, "argument_size_in_bytes", 0) / 2**30, 3),
        "out_gb": round(getattr(ma, "output_size_in_bytes", 0) / 2**30, 3),
    }), flush=True)
    if args.run:
        import numpy as np

        out = compiled(keys, ())
        ovf = bool(np.asarray(out[-1]))
        k_out = out[0]
        ok = bool(np.asarray(jax.jit(
            lambda a: jnp.all(a[1:] >= a[:-1]))(k_out))) if not ovf else None
        print(json.dumps({"executed": True, "overflow": ovf,
                          "sorted": ok}), flush=True)


if __name__ == "__main__":
    main()
