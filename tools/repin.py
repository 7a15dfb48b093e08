#!/usr/bin/env python3
"""Build the round-11 BASELINE pin table from N full-sweep BENCH_DETAIL
JSON lines (one per sweep file): per-query min + cross-sweep band."""
import json
import sys

sweeps = []
for path in sys.argv[1:]:
    line = [l for l in open(path) if l.startswith("BENCH_DETAIL ")][-1]
    sweeps.append(json.loads(line[len("BENCH_DETAIL "):]))

names = sorted(sweeps[0]["queries"].keys())
for s in sweeps:
    assert s["n_err"] == 0, s["errors"]
    assert sorted(s["queries"].keys()) == names, "query sets differ"

totals = [sum(s["queries"].values()) for s in sweeps]
rows = []
for n in names:
    vals = [s["queries"][n] for s in sweeps]
    pin = min(vals)
    band = max(vals) / max(pin, 1e-9)
    rows.append((n, pin, band))

rows.sort(key=lambda r: -r[1])
bands = sorted(r[2] for r in rows)
med = bands[len(bands) // 2]
p90 = bands[int(len(bands) * 0.9)]
mx = max(rows, key=lambda r: r[2])
print(f"sweep totals: {' / '.join(f'{t:.1f}' for t in totals)} s; "
      f"queries: {len(rows)}; pinned total {sum(r[1] for r in rows):.1f} s")
print(f"band: median {med:.2f}x, p90 {p90:.2f}x, max {mx[2]:.2f}x on {mx[0]}")
print()
print("| query | pin s | band |")
print("|---|---|---|")
for n, pin, band in rows:
    print(f"| {n} | {pin:.2f} | {band:.2f}x |")
