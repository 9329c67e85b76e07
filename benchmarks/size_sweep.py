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
    for lg in args.sizes:
        r = subprocess.run(
            [sys.executable, "bench.py", "--log2n", str(lg), "--iters", "2"],
            capture_output=True, text=True, timeout=900,
            cwd=os.path.dirname(os.path.abspath(__file__)) + "/..",
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if line:
            d = json.loads(line[-1])
            d["log2n"] = lg
            rows.append(d)
            print(json.dumps(d), flush=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)

if __name__ == "__main__":
    main()
