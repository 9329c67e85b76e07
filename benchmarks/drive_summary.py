"""Summarize a roundtwo_drive.log into a decision table.

Groups the log by its ``=== <cmd> === <time>`` step headers, pulls the
result lines (throughput ``->`` lines, bench JSON rows, check verdicts),
and prints a compact per-step table.  (The round-2 gather/u16 config
decisions this tool also printed are gone with those paths: the round-3
on-chip probes refuted them — cross-vreg gathers and u16 rolls do not
lower in Mosaic.)

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


if __name__ == "__main__":
    main()
