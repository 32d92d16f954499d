#!/usr/bin/env python3
"""Per-query bench regression diff.

Usage: python3 dev/bench_compare.py BASELINE.json CURRENT.json [factor]

Each file is either a bench_detail.json ({"queries": {name: sec}}) or
a BENCH_r*.json headline line containing a "queries" map. Prints
queries slower than `factor`x baseline (default 1.5) sorted by
absolute regression, then the improvements, then coverage drift
(queries present on only one side). Exit code 1 if any regression
exceeds the factor AND costs more than 0.2s absolute — so noise on
sub-100ms queries never fails a round.
"""
import sys, json

def load(path):
    raw = open(path).read()
    # headline lines may carry a log prefix before the JSON object
    obj = json.loads(raw[raw.index("{"):])
    if "queries" in obj and isinstance(obj["queries"], dict):
        return obj["queries"]
    return obj

base = load(sys.argv[1])
cur = load(sys.argv[2])
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

shared = sorted(set(base) & set(cur))
regs, wins = [], []
for q in shared:
    b, c = base[q], cur[q]
    if b > 0 and c > b * factor:
        regs.append((c - b, q, b, c))
    elif c > 0 and b > c * factor:
        wins.append((b - c, q, b, c))

fail = False
print(f"{len(shared)} shared queries; factor {factor}x")
for d, q, b, c in sorted(regs, reverse=True):
    flag = " FAIL" if d > 0.2 else ""
    fail = fail or d > 0.2
    print(f"REGRESSION {q}: {b:.3f}s -> {c:.3f}s (+{d:.3f}s){flag}")
for d, q, b, c in sorted(wins, reverse=True):
    print(f"improved   {q}: {b:.3f}s -> {c:.3f}s (-{d:.3f}s)")
for q in sorted(set(base) - set(cur)):
    print(f"DROPPED    {q} (was {base[q]:.3f}s)")
for q in sorted(set(cur) - set(base)):
    print(f"new        {q} ({cur[q]:.3f}s)")
sys.exit(1 if fail else 0)
