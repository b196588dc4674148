#!/usr/bin/env python3
"""Build the SCALING.md per-query table from three Bench JSON lines:

  A: driver sf0.1 data      (calibration: same scale as B, different generator)
  B: GenData sf0.1 replica  (denominator — same generator as C)
  C: GenData sf1 (10x B)    (numerator)

ratio = C/B measures data-scaling with generator held fixed; B/A ~ 1 shows the
replica is representative of the driver's data. Fixed per-query overhead
(Spark job setup, planning; ~0.1-0.2 s) means perfectly linear queries show
ratio < 10; ratio ~ 10 is linear in the worst case; >> 10 is super-linear.

Usage: scaling_report.py A.json B.json C.json
"""
import json, sys

def load(p):
    with open(p) as f:
        return json.load(f)["queries"]

a, b, c = (load(p) for p in sys.argv[1:4])
common = sorted(set(b) & set(c))
rows = []
for q in common:
    tb, tc = b[q], c[q]
    ratio = tc / tb if tb > 0 else float("inf")
    rows.append((q, a.get(q), tb, tc, ratio))
print(f"| query | t_sf0.1 driver (s) | t_sf0.1 gen (s) | t_sf1 gen (s) | x (sf1/sf0.1) |")
print("|---|---|---|---|---|")
for q, ta, tb, tc, r in sorted(rows, key=lambda x: -x[4]):
    flag = " **super-linear**" if r > 12 and tc > 1.0 else ""
    ta_s = f"{ta:.2f}" if ta is not None else "—"
    print(f"| {q} | {ta_s} | {tb:.2f} | {tc:.2f} | {r:.1f}{flag} |")

tot_b = sum(t for _, _, t, _, _ in rows)
tot_c = sum(t for _, _, _, t, _ in rows)
print(f"\ntotal: sf0.1gen {tot_b:.1f} s -> sf1 {tot_c:.1f} s  ({tot_c/tot_b:.1f}x for 10x data, {len(rows)} queries)")
sus = [(q, r) for q, _, _, tc, r in rows if r > 12 and tc > 1.0]
print("super-linear (x>12 and t_sf1>1s):", sus if sus else "none")
