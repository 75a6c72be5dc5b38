#!/usr/bin/env python3
"""Summarize a ScaleRun log into the BASELINE.md sf1 table: per query,
min wall across passes plus the shuffle bytes of that pass.

Usage: python3 tools/scale_table.py /tmp/scalerun_r7.log
"""
import re
import sys
from collections import defaultdict

pat = re.compile(
    r"\[scale\] pass=(\d+) q=(\S+)\s+([\d.]+)s rows=(\d+)\s+"
    r"shufR=\s*([\d.]+)MB shufW=\s*([\d.]+)MB stateRows=(\d+)")

runs = defaultdict(list)
for line in open(sys.argv[1]):
    m = pat.search(line)
    if m:
        p, q, sec, rows, sr, sw, st = m.groups()
        runs[q].append((float(sec), int(rows), float(sr), float(sw), int(st)))

print("| query | wall (min of passes) | rows | shufR MB | shufW MB | state rows |")
print("|---|---|---|---|---|---|")
for q in sorted(runs):
    best = min(runs[q], key=lambda r: r[0])
    sec, rows, sr, sw, st = best
    state = str(st) if st else ""
    print(f"| {q} | {sec:.2f} s | {rows} | {sr:.1f} | {sw:.1f} | {state} |")
