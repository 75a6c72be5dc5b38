#!/usr/bin/env python3
"""Regenerate BASELINE.md's per-query committed-seconds table from
BASELINE_GATE.json (the table is literal markdown; hand-editing 100+
rows after each tools/recompute_gates.py run is error-prone).

Replaces the rows of the first `| query | sec |` table in BASELINE.md
with one sorted row per gate entry. Run after recompute_gates.py.

Usage: python3 tools/gate_table.py [BASELINE_GATE.json] [BASELINE.md]
"""
import json
import sys

gate_path = sys.argv[1] if len(sys.argv) > 1 else "BASELINE_GATE.json"
md_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE.md"

queries = json.load(open(gate_path))["queries"]
lines = open(md_path).read().split("\n")
start = lines.index("| query | sec |")
assert lines[start + 1] == "|---|---|", "table header not found"
end = start + 2
while end < len(lines) and lines[end].startswith("| "):
    end += 1
new = [f"| {k} | {v:.2f} |" for k, v in sorted(queries.items())]
print(f"{md_path}: replaced {end - start - 2} rows with {len(new)}")
lines[start + 2:end] = new
open(md_path, "w").write("\n".join(lines))
