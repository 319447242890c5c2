#!/usr/bin/env python3
"""Per-gate per-decade scaling table from two Bench JSON artifacts.

Usage: scale_table.py <lowSF.json> <highSF.json> [threshold]
Prints a markdown table of gates whose high/low factor exceeds the
threshold (default 0 = all), sorted by factor descending. Gates under
0.2 s at the LOW sf are noise-floored (fixed per-gate harness cost
dominates) and marked.
"""
import json, sys

lo = json.load(open(sys.argv[1]))
hi = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
ql, qh = lo["queries"], hi["queries"]
rows = []
for k in sorted(ql):
    if k not in qh or ql[k] < 0 or qh[k] < 0:
        continue
    f = qh[k] / max(ql[k], 1e-3)
    rows.append((f, k, ql[k], qh[k]))
rows.sort(reverse=True)
print(f"| gate | {sys.argv[1]} | {sys.argv[2]} | x/decade |")
print("|---|---|---|---|")
for f, k, a, b in rows:
    if f < thr:
        continue
    note = " (noise floor)" if a < 0.2 else ""
    print(f"| {k} | {a:.2f} | {b:.2f} | {f:.1f}x{note} |")
tot_l = sum(r[2] for r in rows)
tot_h = sum(r[3] for r in rows)
print(f"\ncommon-set totals: {tot_l:.1f} -> {tot_h:.1f} "
      f"({tot_h / max(tot_l, 1e-3):.2f}x), {len(rows)} gates")
