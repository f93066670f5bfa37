#!/usr/bin/env python3
"""Per-query scaling ratios between two Bench artifacts.

Usage: scaling_report.py <base_bench.json> <scaled_bench.json> [data_factor]

Compares the scaled run's single-sweep timings against the base run's
per-query MINIMUMS (the least contention-biased estimate on this VM) and
prints queries sorted by ratio. With data_factor F (default 10), a query
growing more than 1.5*F is flagged superlinear; constant-cost queries
(bounded inputs, model-sized work) showing ratios ~1 are expected.
"""
import json, sys

base = json.load(open(sys.argv[1]))
scaled = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

bq = base.get('queries_min') or base['queries']
sq = scaled.get('queries_min') or scaled['queries']
rows = []
for q in sorted(sq):
    if q in bq and bq[q] > 0:
        rows.append((sq[q] / bq[q], q, bq[q], sq[q]))
rows.sort(reverse=True)
flagged = [r for r in rows if r[0] > 1.5 * factor and r[3] > 1.0]
print(f"base total(min): {sum(bq.values()):.1f}s  scaled total: {sum(sq.values()):.1f}s  "
      f"overall ratio: {sum(sq.values())/sum(bq.values()):.2f}x for {factor:.0f}x data")
print(f"\n{'ratio':>7}  {'base_s':>8}  {'scaled_s':>8}  query")
for r, q, b, s in rows:
    mark = ' <-- SUPERLINEAR' if (r, q, b, s) in flagged else ''
    print(f"{r:7.2f}  {b:8.2f}  {s:8.2f}  {q}{mark}")
print(f"\nflagged >{1.5*factor:.0f}x (and >1s): {[q for _, q, _, _ in flagged]}")
