"""True multi-process (multi-host simulation) distributed sort.

Unlike the 8-virtual-device single-process mesh used elsewhere, this
spawns separate OS processes joined via ``jax.distributed.initialize``
with gloo CPU collectives — per-process addressable shards, collectives
spanning process boundaries — the same program shape as a multi-host TPU
pod slice.  Workers verify local shard order, cross-process boundary
monotonicity, and global multiset checksums (benchmarks/multiprocess_sim.py).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "benchmarks", "multiprocess_sim.py")


@pytest.mark.slow
@pytest.mark.parametrize("pairs", [False, True])
def test_multiprocess_global_sort(pairs):
    env = dict(os.environ)
    # fresh processes must not inherit this test process's 8-device flag
    env.pop("XLA_FLAGS", None)
    args = [sys.executable, SCRIPT, "--nprocs", "2",
            "--devices-per-proc", "2", "--log2n", "12",
            "--port", "56311" if pairs else "56313"]
    if pairs:
        args.append("--pairs")
    res = subprocess.run(args, env=env, cwd=REPO, timeout=540,
                         capture_output=True, text=True)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "'ok': True" in res.stdout
