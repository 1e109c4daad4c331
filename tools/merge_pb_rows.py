#!/usr/bin/env python3
"""Merge the per-query sf10 pair-bound feasibility rows (r14 verdict #7)
into one committed artifact. Each /tmp/bench_sf10_pb_<q>.json is a
single-query Bench artifact (reps=1); recorded verdicts (timeout /
disk-floor / failure) from /tmp/sf10_pb_verdicts.txt land as explicit
entries so the artifact documents the wall, not just the survivors."""
import glob
import json
import os
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "artifacts/bench_sf10_pairbound_r15.json"
rows, sf = {}, None
for f in sorted(glob.glob("/tmp/bench_sf10_pb_*.json")):
    d = json.load(open(f))
    sf = d.get("sf", sf)
    for q, v in d.get("queries_min", {}).items():
        if v < 0:  # killed mid-run: Bench's not-yet-measured sentinel
            continue
        rows[q] = {"sec_min": round(v, 3),
                   "sec_first": round(d.get("queries_first", {}).get(q, v), 3),
                   "records": d.get("records", {}).get(q),
                   "verdict": "ran"}
verdict_file = "/tmp/sf10_pb_verdicts.txt"
if os.path.exists(verdict_file):
    for line in open(verdict_file):
        parts = line.strip().split("\t")
        if len(parts) != 2 or not parts[0]:
            continue  # blank / malformed append — not a verdict
        q, v = parts
        # The verdict file is append-only across runs and the runner
        # skips queries with existing rows, so a stale timeout line
        # must not relabel a later measured run: a row with sec_min
        # keeps its "ran" verdict.
        if "sec_min" not in rows.get(q, {}):
            rows.setdefault(q, {})["verdict"] = v
json.dump({"sf": sf, "reps": 1, "note": "full pair-bound family at sf10; "
           "timeout/skip verdicts are recorded outcomes, not absences",
           "rows": rows}, open(OUT, "w"), indent=1, sort_keys=True)
print(f"wrote {OUT}: {len(rows)} rows "
      f"({sum(1 for r in rows.values() if r.get('verdict') == 'ran')} ran)")
