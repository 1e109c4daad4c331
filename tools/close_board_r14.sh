#!/usr/bin/env bash
# The round-14 CLOSE PROTOCOL (r13 verdict #2's standing ask): every
# round's closing board ships WITH its bench_diff triage against the
# standing quiet anchor, or it doesn't ship. Run on an otherwise idle
# box; check `uptime` before trusting the numbers.
#
# 1. Full-board bench at sf0.1 (reps=3, the driver's shape).
# 2. bench_diff vs artifacts/bench_r14_quiet_sf0.1.json — the
#    195-query quiet anchor (r14; load 0.21) that BASELINE.md names as
#    the r13+ comparison base. Movers must each be (a) at/below the
#    anchor min (box noise, closed), or (b) root-caused in the
#    committed triage text.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-artifacts/bench_r14_closing_sf0.1.json}
ANCHOR=${2:-artifacts/bench_r14_quiet_sf0.1.json}

uptime
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
SPARK_GRAFT_BENCH_REPS=${SPARK_GRAFT_BENCH_REPS:-3} \
SPARK_GRAFT_BENCH_OUT="$OUT" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep metric
echo "== bench_diff vs $ANCHOR =="
python3 tools/bench_diff.py "$ANCHOR" "$OUT" --since ccfac12 || true
echo "wrote $OUT"
