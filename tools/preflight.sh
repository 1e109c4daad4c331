#!/usr/bin/env bash
# Pre-snapshot correctness gate (round-6, verdict task #2).
#
# Runs graft.Verify (every declared query -> parquet + oracle_sql.json)
# and tools/check_oracles.py (the driver-mirroring DuckDB compare) at
# one SF, failing loudly on ANY mismatch. Run this before every
# snapshot commit; only update BASELINE.md / SURVEY.md green-claims
# after it exits 0. Round 5 shipped a red oracle (interp_gap_fill) in
# the final commit precisely because nothing enforced this.
#
# Usage: tools/preflight.sh [sfDir] [outDir]
#   default sfDir  = /root/testdata/sf0.01  (the driver's gate SF)
#   default outDir = /tmp/graft_preflight
#
# `sbt test` is a separate, complementary gate — run both before a
# snapshot: tools/preflight.sh && sbt -batch test
set -uo pipefail

SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/graft_preflight}"
cd "$(dirname "$0")/.."

rm -rf "$OUT"
LOG=/tmp/preflight_sbt.log
if ! sbt -batch "runMain graft.Verify $SF $OUT" >"$LOG" 2>&1; then
  tail -30 "$LOG"
  echo "PREFLIGHT FAIL: graft.Verify did not complete (full log: $LOG)" >&2
  exit 1
fi
# Verify catches per-query throwables and keeps going -- surface them
# (sbt re-prefixes the program's stderr, so match anywhere in the line)
if grep -q '\[verify\]' "$LOG"; then
  grep '\[verify\]' "$LOG" >&2
  echo "PREFLIGHT FAIL: one or more queries threw during Verify" >&2
  exit 1
fi

if python3 tools/check_oracles.py "$SF" "$OUT"; then
  echo "PREFLIGHT OK: all oracled queries match at $SF"
else
  echo "PREFLIGHT FAIL: oracle mismatches at $SF (see above)" >&2
  exit 1
fi
