#!/usr/bin/env python3
"""Generate the SCALE.md full-catalog growth appendix from two bench runs.

Usage:
  python3 tools/make_scale_appendix.py <bench_sf01_times.json> <bench_sf1_times.json>

Each input is a target/bench_times.json written by graft.Bench (1-3 JSON
lines: cold / warm / min per-query maps). The per-query MIN across the
file's passes is used on both sides (the de-noised measurement of record,
per BASELINE.md round-7 rationale). Output: a markdown table on stdout,
spliced into SCALE.md between the APPENDIX markers by the caller.
"""
import json, sys


def min_map(path):
    # skip the stream_split diagnostic line (its per-query values are
    # [startup, data, batches] arrays, not seconds)
    lines = [json.loads(l) for l in open(path) if l.strip()]
    maps = [d["queries"] for d in lines if d.get("metric") != "stream_split"]
    out = {}
    for m in maps:
        for q, v in m.items():
            out[q] = min(out.get(q, 1e18), v)
    return out


a = min_map(sys.argv[1])   # sf0.1
b = min_map(sys.argv[2])   # sf1 (10x rows on fact tables)

def qkey(q):
    return int(q[1:])

rows = []
flagged = []
for q in sorted(set(a) & set(b), key=qkey):
    g = b[q] / a[q] if a[q] > 0 else float("inf")
    rows.append((q, a[q], b[q], g))
    # 10x data -> 10x time IS linear; only growth beyond the data growth
    # is superlinear (the scale-killer signal)
    if g > 10.0:
        flagged.append((q, g))

print("| query | sf0.1 min | sf1 (10×) min | growth |")
print("|---|---|---|---|")
for q, x, y, g in rows:
    print(f"| {q} | {x:.2f} s | {y:.2f} s | {g:.1f}× |")
missing = sorted(set(a) ^ set(b), key=qkey)
if missing:
    print(f"\nqueries present in only one run: {', '.join(missing)}")
if flagged:
    print(f"\nsuperlinear (>10× time at 10× data): "
          f"{', '.join(f'{q} ({g:.1f}×)' for q, g in flagged)}")
else:
    print("\nno query grows faster than the data (>10×) in this run.")
