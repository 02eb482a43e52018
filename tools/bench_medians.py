#!/usr/bin/env python3
"""Aggregate multiple Bench JSON lines (one per run) into per-query
medians-across-runs — the quiet-host probe protocol the judge asked for:
single-run spikes are host noise; medians across ≥3 runs decide the gate.

Usage: python3 tools/bench_medians.py /tmp/bench_probe/runs.jsonl [baseline.json]
"""
import json, statistics, sys

runs = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
if not runs:
    sys.exit("no runs")
queries = sorted({q for r in runs for q in r.get("queries", {})})
builds = sorted({b for r in runs for b in r.get("builds", {})})

def med(vals):
    return round(statistics.median(vals), 2)

print(f"runs: {len(runs)}  sf: {runs[0].get('sf')}")
qmed = {}
for q in queries:
    vals = [r["queries"][q] for r in runs if q in r.get("queries", {})]
    qmed[q] = med(vals)
    spread = f"{min(vals):.2f}-{max(vals):.2f}" if len(vals) > 1 else ""
    print(f"  {q:28s} med {qmed[q]:7.2f}  ({spread})")
for b in builds:
    vals = [r["builds"][b] for r in runs if b in r.get("builds", {})]
    print(f"  [build] {b:20s} med {med(vals):7.2f}  ({min(vals):.2f}-{max(vals):.2f})")
print(f"query_total(medians): {round(sum(qmed.values()), 1)}")
errors = [r.get("errors") for r in runs if r.get("errors")]
if errors:
    print("ERRORS:", errors)
