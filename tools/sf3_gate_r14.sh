#!/usr/bin/env bash
# Round-14 sf3 FULL-BOARD refresh (r13 verdict #1 — the r12 task that
# produced a script but no artifact): one consolidated re-run at HEAD
# so the standing sf3 certification stops being CORRECTNESS_sf3_r10
# .json, whose IVF-family rows are known-stale (sampled training +
# distributed seeds changed those results twice since).
# Protocol: one full-board Verify dump, then every oracled query
# replayed SERIALLY in DuckDB with one durable JSON chunk per query
# (a crash loses at most one oracle's work). Consolidate with
#   python3 tools/consolidate_chunks.py '/tmp/cc_sf3_r14_*.json' \
#     CORRECTNESS_sf3_r14.json $OUT/oracle_sql.json
# (name-set validated against the dump's own census).
#
# r13-advice fix vs sf3_gate_r13.sh: the '[verify] query threw' check
# is hoisted OUT of the fresh-Verify branch — Verify catches per-query
# failures and still writes oracle_sql.json, so a rerun over a dump
# dir from a partially-failed Verify must not proceed; every query in
# oracle_sql.json must have its parquet dump present.
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/tmp/graft_data/sf3}
OUT=${2:-/tmp/verify_sf3_r14}

if [ ! -f "$OUT/oracle_sql.json" ]; then
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} SPARK_GRAFT_CPUS=24 \
    sbt -batch "runMain graft.Verify $SF $OUT" \
    > /tmp/verify_sf3_r14_sbt.log 2>&1 || {
      tail -20 /tmp/verify_sf3_r14_sbt.log; exit 1; }
fi

# dump-completeness check, fresh run or rerun alike: a query that
# threw during Verify leaves no parquet dir but IS in oracle_sql.json
MISSING=$(python3 - "$OUT" <<'EOF'
import json, os, sys
out = sys.argv[1]
qs = json.load(open(os.path.join(out, "oracle_sql.json")))
missing = [q for q in sorted(qs)
           if not os.path.isdir(os.path.join(out, q))]
print("\n".join(missing))
EOF
)
if [ -n "$MISSING" ]; then
  echo "SF3 GATE: parquet dump missing for:" >&2
  echo "$MISSING" >&2
  grep '\[verify\]' /tmp/verify_sf3_r14_sbt.log >&2 2>/dev/null || true
  echo "re-dump with SPARK_GRAFT_ONLY=<names> then rerun" >&2
  exit 1
fi

QUERIES=$(python3 -c "
import json
print('\n'.join(sorted(json.load(open('$OUT/oracle_sql.json')))))")

for q in $QUERIES; do
  chunk=/tmp/cc_sf3_r14_$q.json
  if [ -s "$chunk" ]; then echo "skip $q (chunk exists)"; continue; fi
  echo "=== oracle: $q ($(date +%H:%M:%S), free: $(df -h / | awk 'NR==2{print $4}'))"
  GRAFT_DUCK_MEM=${GRAFT_DUCK_MEM:-45GB} GRAFT_JSON_OUT="$chunk" \
    python3 tools/check_oracles.py "$SF" "$OUT" "$q" || true
  rm -rf /tmp/duck_spill_* 2>/dev/null
done
echo "sf3 r14 gate chunks done"
