#!/usr/bin/env python3
"""Recompute BASELINE_GATE.json from >=3 full Bench runs at sf0.1.

Policy (BASELINE.md): per-query committed value = elementwise MAX over
the runs (each already min-of-passes), floored at 0.6 s noise floor;
total_gate_sec = 2x the max observed run total; warmup ceiling =
2x the worst warmup observed ON ANY HOST (cross-host — pass it with
--warmup-worst when a remote host's observation exceeds the local runs,
else the local max is used).

Calibration anchors (round-10 CPU, round-19 IO): each Bench run emits
`calib_sec` (FIXED CPU+shuffle micro-query) and `calib_io_sec` (FIXED
~100 MB parquet write+readback — the IO-shaped probe that catches the
filesystem/page-cache contention the CPU probe is blind to: the
round-18 basis carried a uniform ~13% IO inflation at calib ~1.0).
Committed `calib_ref_sec` / `calib_io_ref_sec` = medians of the
gate-setting runs' probes; `warmup_ref_sec` = max of their warmups.
Interpretation rule (BASELINE.md "Bench methodology"): for any later
run, host_factor = max(calib_sec / calib_ref_sec,
calib_io_sec / calib_io_ref_sec); a per-query time that breaches its
2x gate but satisfies time / host_factor <= 2x gate is host
contention, not a code regression — machine-adjudicable without
re-running.

QUIET-RUN ENFORCEMENT (round-19, VERDICT r18 item 2): a campaign run
is quiet only when BOTH probes sit within 1.10x of the campaign's own
MEDIAN probe (a relative basis — comparing to the stale committed
anchor would reject every run after a deliberate re-anchor; the
median rather than the minimum because one outlier-FAST probe — an
idle-turbo artifact — must not flag ordinary runs as contended, only
genuinely slower-than-center runs). Flagged
runs abort the recompute so the elementwise-max policy cannot fold
transient IO weather into the committed values (the round-18
episode); pass --allow-flagged to accept them deliberately and
document why in BASELINE.md.

MULTI-WINDOW PROBES (round-20, VERDICT r19 item 1): Bench now runs
each probe in THREE windows (post-warmup + between the timed passes)
and reports the MEDIAN as calib_sec / calib_io_sec plus the raw
calib_windows / calib_io_windows arrays. A run whose intra-run window
spread (max/min) exceeds 1.3x on either probe is UNRELIABLE — the
committed BENCH_r19 failure mode: one transient spike in a lone probe
window misstates the host factor for the whole run — and aborts the
recompute (--allow-flagged to override).

RE-ANCHOR GUARD (round-20, round-19 ADVICE): the quiet-run rule above
is RELATIVE (campaign median), so a UNIFORMLY contended campaign —
every run inflated, the round-18 ~13% episode — passes it unflagged.
When out.json already carries committed calib_ref_sec /
calib_io_ref_sec anchors and the campaign median deviates >1.10x from
either (EITHER direction — slower folds weather into the gates,
faster writes gates a normal host breaches), the recompute aborts
unless --re-anchor is passed, so whole-campaign weather is surfaced
rather than silently re-anchored.

WARMUP OBSERVABILITY (round-20, VERDICT r19 item 2): runs carrying
the per-query warmup_queries map get a warmup top-10 report (max
across runs), and movers vs a basis file's warmup_queries
(--warmup-basis PATH, e.g. the previous round's committed
BENCH_FULL_sf0.1.json) are listed so a warmup-ceiling drift is
attributable to a stage.

Usage: python3 tools/recompute_gates.py [--warmup-worst SEC] [--allow-flagged] [--re-anchor] [--warmup-basis PATH] out.json run1.json run2.json ...
"""
import json
import math
import os
import sys

args = sys.argv[1:]
if not args:
    sys.exit(__doc__)
warmup_worst = None
allow_flagged = False
re_anchor = False
warmup_basis = None
while args and args[0].startswith("--"):
    if args[0] == "--warmup-worst":
        warmup_worst = float(args[1])
        args = args[2:]
    elif args[0] == "--allow-flagged":
        allow_flagged = True
        args = args[1:]
    elif args[0] == "--re-anchor":
        re_anchor = True
        args = args[1:]
    elif args[0] == "--warmup-basis":
        warmup_basis = args[1]
        args = args[2:]
    else:
        sys.exit(f"unknown flag {args[0]}")
out_path, runs = args[0], args[1:]
assert len(runs) >= 3, "need >=3 runs"
datas = []
for p in runs:
    line = open(p).read().strip().removeprefix("[info] ")
    d = json.loads(line)
    for field in ("queries", "value", "warmup_sec", "calib_sec",
                  "calib_io_sec"):
        assert field in d, (
            f"{p}: missing '{field}' — pre-round-19 run files lack the "
            "IO calibration probe; re-run Bench on the current build")
    datas.append(d)

# Quiet-run enforcement: both probes within 1.10x of the campaign's
# MEDIAN probe, or the recompute aborts (see module doc).
def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]
med_cpu = median([d["calib_sec"] for d in datas])
med_io = median([d["calib_io_sec"] for d in datas])
flagged = []
for p, d in zip(runs, datas):
    r_cpu = d["calib_sec"] / med_cpu
    r_io = d["calib_io_sec"] / med_io
    if r_cpu > 1.10 or r_io > 1.10:
        flagged.append(f"{p}: calib {d['calib_sec']:.3f} ({r_cpu:.2f}x "
                       f"median), calib_io {d['calib_io_sec']:.3f} "
                       f"({r_io:.2f}x median)")
    # Intra-run probe-window spread (multi-window probes, round-20):
    # a lone spiked window inside an otherwise-quiet run makes the
    # run's host factor unreliable — BENCH_r19's committed run read a
    # 2.6x CPU probe while its battery ran 7% FASTER than r18.
    for field, label in (("calib_windows", "calib"),
                         ("calib_io_windows", "calib_io")):
        ws = d.get(field)
        if ws and min(ws) > 0 and max(ws) / min(ws) > 1.3:
            flagged.append(
                f"{p}: {label} windows {[round(w, 3) for w in ws]} "
                f"spread {max(ws) / min(ws):.2f}x > 1.3x — unreliable "
                "probe, re-run")
if flagged:
    msg = "non-quiet campaign runs:\n  " + "\n  ".join(flagged)
    if allow_flagged:
        print(f"WARNING (accepted via --allow-flagged): {msg}")
    else:
        sys.exit(f"ABORT: {msg}\n"
                 "re-run the flagged runs on a quiet host, or pass "
                 "--allow-flagged to fold them in deliberately")

# Re-anchor guard (round-19 ADVICE): uniform whole-campaign weather is
# invisible to the relative quiet-run rule above — compare the campaign
# medians against the PREVIOUSLY COMMITTED anchors and require an
# explicit --re-anchor when either deviates >1.10x in either direction.
if not re_anchor and os.path.exists(out_path):
    try:
        prev = json.load(open(out_path))
    except (ValueError, OSError):
        prev = {}
    drifted = []
    for ref_key, med, label in (("calib_ref_sec", med_cpu, "calib"),
                                ("calib_io_ref_sec", med_io, "calib_io")):
        ref = prev.get(ref_key)
        if ref and not (1 / 1.10 <= med / ref <= 1.10):
            drifted.append(f"{label} campaign median {med:.3f} vs "
                           f"committed {ref_key} {ref:.3f} "
                           f"({med / ref:.2f}x)")
    if drifted:
        sys.exit("ABORT: whole-campaign probe drift vs committed "
                 "anchors:\n  " + "\n  ".join(drifted) + "\n"
                 "the relative quiet-run rule cannot see uniform "
                 "contention (round-18 episode) — re-run on a quiet "
                 "host, or pass --re-anchor to deliberately adopt the "
                 "new anchors and document the host change in "
                 "BASELINE.md")

# The warmup ceiling is CROSS-HOST calibrated (BASELINE.md): without an
# explicit --warmup-worst, never silently tighten below the previously
# committed ceiling's implied worst — a fast local host would otherwise
# write a gate the slower grading host breaches with no code change.
prev_warmup_gate = None
if warmup_worst is None and os.path.exists(out_path):
    try:
        prev_warmup_gate = json.load(open(out_path)).get("warmup_gate_sec")
    except (ValueError, OSError):
        pass

keys = set(datas[0]["queries"])
for d in datas[1:]:
    assert set(d["queries"]) == keys, "run key sets differ"

# Ceil to 2dp: the committed value is the elementwise MAX over the
# runs, so rounding must never land BELOW an observed time (round()
# would commit 1.37 for an observed 1.374, making the gate-setting run
# itself a nominal 1x breach). The round() guards float fuzz like
# 1.3800000001 ceiling to 1.39.
queries = {q: math.ceil(round(max(0.6, max(d["queries"][q] for d in datas))
                              * 100, 6)) / 100
           for q in sorted(keys)}
total_gate = round(2 * max(d["value"] for d in datas), 1)
calibs = sorted(d["calib_sec"] for d in datas)
calib_ref = round(calibs[len(calibs) // 2], 3)
calibs_io = sorted(d["calib_io_sec"] for d in datas)
calib_io_ref = round(calibs_io[len(calibs_io) // 2], 3)
warmups = [d["warmup_sec"] for d in datas]
worst_warmup = max(warmups + ([warmup_worst] if warmup_worst is not None
                              else []))
warmup_gate = round(2 * worst_warmup, 1)
if prev_warmup_gate is not None and warmup_gate < prev_warmup_gate:
    print(f"keeping previous cross-host warmup ceiling {prev_warmup_gate} "
          f"(local-only recompute would tighten to {warmup_gate}; pass "
          "--warmup-worst to recalibrate deliberately)")
    warmup_gate = prev_warmup_gate
gate = {
    "metric": "total",
    "value": round(sum(queries.values()), 2),
    "unit": "sec",
    "queries": queries,
    "total_gate_sec": total_gate,
    "warmup_gate_sec": warmup_gate,
    "warmup_ref_sec": round(max(warmups), 1),
    "calib_ref_sec": calib_ref,
    "calib_io_ref_sec": calib_io_ref,
    "sf": datas[0]["sf"],
}
# Warmup observability (VERDICT r19 item 2): report where the untimed
# warmup pass spends its time, and the top movers vs an optional basis.
wq_runs = [d.get("warmup_queries") for d in datas if d.get("warmup_queries")]
if wq_runs:
    wq_max = {q: max(w[q] for w in wq_runs if q in w)
              for q in {k for w in wq_runs for k in w}}
    top = sorted(wq_max.items(), key=lambda kv: -kv[1])[:10]
    print("warmup top-10 (max across runs): " +
          ", ".join(f"{q} {t:.1f}s" for q, t in top))
    if warmup_basis and os.path.exists(warmup_basis):
        base = json.load(open(warmup_basis)).get("warmup_queries", {})
        movers = sorted(((q, base[q], t) for q, t in wq_max.items()
                         if q in base and base[q] >= 1.0
                         and t / base[q] > 1.5),
                        key=lambda x: -(x[2] / x[1]))[:10]
        if movers:
            print("warmup movers >1.5x vs basis: " + ", ".join(
                f"{q} {b:.1f}->{t:.1f}s" for q, b, t in movers))
        else:
            print("warmup movers vs basis: none >1.5x (of stages >=1s)")

json.dump(gate, open(out_path, "w"), indent=2)
print(f"wrote {out_path}: {len(queries)} queries, committed sum "
      f"{gate['value']}, total_gate {total_gate}, warmup_gate "
      f"{gate['warmup_gate_sec']}, calib_ref {calib_ref}, "
      f"calib_io_ref {calib_io_ref}, "
      f"observed totals {[d['value'] for d in datas]}, "
      f"calibs {calibs}, calibs_io {calibs_io}, "
      f"warmups {[round(w,1) for w in warmups]}")
