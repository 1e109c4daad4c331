#!/usr/bin/env bash
# The round-15 CLOSE PROTOCOL. Supersedes close_board_r14.sh, which
# had two enforcement gaps (r14 verdict #2, r14 ADVICE):
#   - no doc-claims-vs-artifacts check, so a doc could cite an
#     artifact that does not exist (the r14 n=6M incident);
#   - `bench_diff ... || true` swallowed mover flags, so the "movers
#     must be triaged or it doesn't ship" contract was not enforced.
#
# This script FAILS unless:
#   1. tools/check_claims.py passes (every artifact path cited by
#      SURVEY.md / BASELINE.md / TESTDATA.md exists);
#   2. the full-board bench at sf0.1 (reps=3) completes;
#   3. bench_diff vs the standing quiet anchor reports NO movers, OR
#      the operator passes a committed triage file as $3 — the file
#      must exist and mention every mover query by name.
#
# Run on an otherwise idle box; check `uptime` before trusting numbers.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-artifacts/bench_r15_closing_sf0.1.json}
ANCHOR=${2:-artifacts/bench_r15_quiet_sf0.1.json}
TRIAGE=${3:-}

echo "== claims gate =="
python3 tools/check_claims.py

uptime
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
SPARK_GRAFT_BENCH_REPS=${SPARK_GRAFT_BENCH_REPS:-3} \
SPARK_GRAFT_BENCH_OUT="$OUT" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep metric

echo "== bench_diff vs $ANCHOR =="
DIFF_OUT=$(python3 tools/bench_diff.py "$ANCHOR" "$OUT" --since 5bfd9ba --fail-on-movers) && rc=0 || rc=$?
echo "$DIFF_OUT"
if [ "$rc" -ne 0 ]; then
  if [ -z "$TRIAGE" ] || [ ! -f "$TRIAGE" ]; then
    echo "CLOSE FAIL: movers reported and no triage file supplied." >&2
    echo "Root-cause each mover, commit the triage text, re-run with" >&2
    echo "  tools/close_board_r15.sh $OUT $ANCHOR <triage-file>" >&2
    exit 1
  fi
  # every mover query name must appear in the triage file
  MISSING=$(echo "$DIFF_OUT" | awk '/^MOVER /{print $2}' | sed 's/:$//' | \
            while read -r q; do grep -q "$q" "$TRIAGE" || echo "$q"; done)
  if [ -n "$MISSING" ]; then
    echo "CLOSE FAIL: triage file $TRIAGE does not mention:" >&2
    echo "$MISSING" >&2
    exit 1
  fi
  echo "movers acknowledged by $TRIAGE"
fi
echo "wrote $OUT"
