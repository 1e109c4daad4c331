#!/usr/bin/env bash
# Round-13 sf3 FULL-BOARD refresh (r12 verdict #7): one consolidated
# re-run at HEAD so the standing sf3 artifact stops mixing the r10
# board with prose supersessions (the IVF-family rows there are
# intentionally stale — sampled training changed those results).
# Protocol: one full-board Verify dump, then every oracled query
# replayed SERIALLY in DuckDB with one durable JSON chunk per query
# (a crash loses at most one oracle's work). Consolidate with
#   python3 tools/consolidate_chunks.py '/tmp/cc_sf3_r13_*.json' \
#     CORRECTNESS_sf3_r13.json <expected>
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/tmp/graft_data/sf3}
OUT=${2:-/tmp/verify_sf3_r13}

if [ ! -f "$OUT/oracle_sql.json" ]; then
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} SPARK_GRAFT_CPUS=24 \
    sbt -batch "runMain graft.Verify $SF $OUT" \
    > /tmp/verify_sf3_r13_sbt.log 2>&1 || {
      tail -20 /tmp/verify_sf3_r13_sbt.log; exit 1; }
  if grep -q '\[verify\]' /tmp/verify_sf3_r13_sbt.log; then
    grep '\[verify\]' /tmp/verify_sf3_r13_sbt.log >&2
    echo "SF3 GATE: a query threw during Verify" >&2; exit 1
  fi
fi

QUERIES=$(python3 -c "
import json
print('\n'.join(sorted(json.load(open('$OUT/oracle_sql.json')))))")

for q in $QUERIES; do
  chunk=/tmp/cc_sf3_r13_$q.json
  if [ -s "$chunk" ]; then echo "skip $q (chunk exists)"; continue; fi
  echo "=== oracle: $q ($(date +%H:%M:%S), free: $(df -h / | awk 'NR==2{print $4}'))"
  GRAFT_DUCK_MEM=${GRAFT_DUCK_MEM:-100GB} GRAFT_JSON_OUT="$chunk" \
    python3 tools/check_oracles.py "$SF" "$OUT" "$q" || true
  rm -rf /tmp/duck_spill_* 2>/dev/null
done
echo "sf3 r13 gate chunks done"
