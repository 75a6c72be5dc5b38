#!/usr/bin/env python3
"""Recompute BASELINE_GATE.json from >=3 full Bench runs at sf0.1.

Policy (BASELINE.md): per-query committed value = elementwise MAX over
the runs (each already min-of-passes), floored at 0.6 s noise floor;
total_gate_sec = 2x the max observed run total; warmup ceiling is kept
from the committed file (cross-host calibrated, not derivable locally).

Usage: python3 tools/recompute_gates.py out.json run1.json run2.json ...
"""
import json
import sys

out_path, runs = sys.argv[1], sys.argv[2:]
assert len(runs) >= 3, "need >=3 runs"
datas = []
for p in runs:
    line = open(p).read().strip().removeprefix("[info] ")
    datas.append(json.loads(line))

keys = set(datas[0]["queries"])
for d in datas[1:]:
    assert set(d["queries"]) == keys, "run key sets differ"

queries = {q: round(max(0.6, max(d["queries"][q] for d in datas)), 2)
           for q in sorted(keys)}
total_gate = round(2 * max(d["value"] for d in datas), 1)
prev = json.load(open(out_path))
gate = {
    "metric": "total",
    "value": round(sum(queries.values()), 2),
    "unit": "sec",
    "queries": queries,
    "total_gate_sec": total_gate,
    "warmup_gate_sec": prev["warmup_gate_sec"],
    "sf": datas[0]["sf"],
}
json.dump(gate, open(out_path, "w"), indent=2)
print(f"wrote {out_path}: {len(queries)} queries, committed sum "
      f"{gate['value']}, total_gate {total_gate}, "
      f"observed totals {[d['value'] for d in datas]}")
