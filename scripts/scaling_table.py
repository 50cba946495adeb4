#!/usr/bin/env python3
"""Emit the per-query sf0.1 -> sf1 scaling table for BASELINE.md.

Usage: scaling_table.py target/bench_full_r7.json target/bench_sf1.json

Rows are sorted by scaling ratio (worst first). The probe corpus is 10x
rows with constant duplicate/similarity density (tools.ScaleUp), so a
perfectly linear operator shows ~10x, minus fixed overheads for the
sub-second queries (which makes <10x common and uninteresting).
"""
import json
import sys

base = json.load(open(sys.argv[1]))["queries"]
scaled = json.load(open(sys.argv[2]))["queries"]

rows = []
for q, t1 in sorted(scaled.items()):
    t0 = base.get(q)
    if t0 is None:
        continue
    rows.append((t1 / t0, q, t0, t1))

print("| query | sf0.1 s | sf1 s | ratio |")
print("|---|---|---|---|")
for r, q, t0, t1 in sorted(rows, reverse=True):
    print(f"| {q} | {t0:.2f} | {t1:.2f} | {r:.1f}x |")
tot0, tot1 = sum(base.values()), sum(scaled.values())
print(f"| TOTAL | {tot0:.1f} | {tot1:.1f} | {tot1 / tot0:.1f}x |")
