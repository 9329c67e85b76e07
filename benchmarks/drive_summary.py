"""Summarize a roundtwo_drive.log into a decision table.

Groups the log by its ``=== <cmd> === <time>`` step headers, pulls the
result lines (throughput ``->`` lines, bench JSON rows, check verdicts),
and prints a compact per-step table plus the two config decisions the
drive exists to make: ``use_gather_pass`` (stable pairs) and
``use_u16_pass`` (keys-only), each decided by comparing the measured
pass-variant rates at 2^26.

Usage: python benchmarks/drive_summary.py [logfile]
"""

from __future__ import annotations

import json
import re
import sys

LOG = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/results/roundtwo_drive.log"

HEADER = re.compile(r"^=== (.*?) === (\d\d:\d\d:\d\d)$")
RESULT = re.compile(r"->|\bcheck\b|PASS|FAIL|\"metric\"|M elem/s|M keys/s|ALL PASS|FAILURES")


def parse(path: str):
    steps = []  # (cmd, time, [result lines])
    cur = None
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            m = HEADER.match(line)
            if m:
                cur = (m.group(1), m.group(2), [])
                steps.append(cur)
            elif cur is not None and RESULT.search(line):
                cur[2].append(line.strip())
    return steps


def rate_of(lines):
    """Last 'X G.../s' or bench-JSON keys/s seen in a step, in G/s."""
    best = None
    for ln in lines:
        m = re.search(r"->\s*([\d.]+)\s*G", ln)
        if m:
            best = float(m.group(1))
        if ln.startswith("{"):
            try:
                row = json.loads(ln)
                best = float(row.get("value", 0)) / 1e9
            except ValueError:
                pass
    return best


def main():
    steps = parse(LOG)
    if not steps:
        print(f"no steps parsed from {LOG}")
        return
    probes = {}
    print(f"{len(steps)} steps\n")
    for cmd, t, lines in steps:
        short = cmd.replace("python ", "").replace("benchmarks/", "")
        print(f"[{t}] {short}")
        for ln in lines[-3:]:
            print(f"    {ln}")
        if not lines:
            print("    (no result line — timed out or crashed)")
        r = rate_of(lines)
        if r is not None:
            probes[short] = r
    # --- config decisions ---
    def find(sub):
        return {k: v for k, v in probes.items() if sub in k}

    print("\n=== decisions ===")
    sg = [v for k, v in find("stage_probe.py pass_stable --log2n 26").items()
          if "--planes" not in k]
    gg = [v for k, v in find("stage_probe.py pass_gather --log2n 26").items()
          if "--planes" not in k and "--values 2" not in k and "--nb" not in k]
    if sg and gg:
        flip = max(gg) > max(sg)
        print(f"use_gather_pass: stable={max(sg):.3f} G/s vs gather="
              f"{max(gg):.3f} G/s -> {'FLIP ON' if flip else 'keep off'}")
    u16 = find("pass_u16 --log2n 26 --values 0")
    full = find("pass_full --log2n 26 --r 32")
    if u16 and full:
        fl = [v for k, v in full.items() if "--k " not in k and "--starts" not in k]
        if fl:
            flip = max(u16.values()) > max(fl)
            print(f"use_u16_pass: full={max(fl):.3f} G/s vs u16(best)="
                  f"{max(u16.values()):.3f} G/s -> {'FLIP ON' if flip else 'keep off'}")
            best_u16 = max(u16, key=u16.get)
            print(f"  best u16 variant: {best_u16}")


if __name__ == "__main__":
    main()
