"""Size-scaling benchmark: keys/s across 2^20..2^29 (one JSON line each).

    python benchmarks/size_sweep.py [--out benchmarks/results/sizes.json]
"""
import argparse
import json
import os
import subprocess
import sys

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/results/sizes.json")
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[20, 22, 24, 26, 28, 29])
    args = ap.parse_args()
    rows = []

    def _flush():
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)

    for lg in args.sizes:
        # one timed-out or crashed size must not lose the collected rows:
        # record the error as a row and rewrite the file incrementally
        try:
            r = subprocess.run(
                [sys.executable, "bench.py", "--log2n", str(lg),
                 "--iters", "2"],
                capture_output=True, text=True, timeout=900,
                cwd=os.path.dirname(os.path.abspath(__file__)) + "/..",
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if line:
                d = json.loads(line[-1])
            else:
                d = {"error": f"exit {r.returncode}",
                     "stderr_tail": r.stderr[-300:]}
        except subprocess.TimeoutExpired:
            d = {"error": "timeout"}
        d["log2n"] = lg
        rows.append(d)
        print(json.dumps(d), flush=True)
        _flush()

if __name__ == "__main__":
    main()
