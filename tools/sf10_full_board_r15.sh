#!/usr/bin/env bash
# Round-15 sf10 FULL-BOARD certification attempt (r14 verdict #3):
# extend the serial heavy-oracle protocol from the 16-query
# scale-sensitive gate (sf10_gate_r14.sh) to EVERY oracled query, in
# disk-budgeted chunks. The r14 oracle spill fixes (AS MATERIALIZED
# CTEs, probe-side restriction, narrow score frames, hash-agg
# elections) were exactly what sf3 needed; this script finds out which
# of the 192 survive sf10's spill on this box's single ~250 GB disk.
#
# Protocol:
#   1. One full-board Verify dump at sf10 (resumable: skipped if
#      oracle_sql.json exists; per-query re-dump via SPARK_GRAFT_ONLY).
#   2. Every oracled query replayed SERIALLY in DuckDB, one durable
#      JSON chunk per query. Per-query guard rails:
#        - disk floor: a query is SKIPPED (recorded, not attempted)
#          when free disk is below $GRAFT_DISK_FLOOR_GB (default 20);
#        - wall clock: `timeout $GRAFT_ORACLE_TIMEOUT` (default 5400 s)
#          — a timeout lands as a recorded verdict, never a hang.
#      Outcomes land in /tmp/cc_sf10_r15_<q>.json (green/red) or
#      /tmp/sf10_r15_verdicts.txt (skip/timeout/ENOSPC) — the
#      documented exclusion list the verdict asks for.
#   3. Consolidate the green set:
#        python3 tools/consolidate_chunks.py '/tmp/cc_sf10_r15_*.json' \
#          CORRECTNESS_sf10_r15.json <filtered-expected.json>
#      where the filtered expected file = oracle_sql.json minus the
#      recorded exclusions (this script prints the exact command).
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/tmp/graft_data/sf10}
OUT=${2:-/tmp/verify_sf10_full_r15}
VERDICTS=/tmp/sf10_r15_verdicts.txt
FLOOR=${GRAFT_DISK_FLOOR_GB:-20}

# Documented exclusion (the r14 verdict's own suggested shape — "like
# Bench.PairBoundQueries but for oracle feasibility"): the 18
# pair-bound queries are excluded from the sf10 board END-TO-END. The
# measured wall is the ENGINE side, not just the oracle —
# artifacts/bench_sf10_pairbound_r15.json clocks minhash_neardup at
# ~1022 s for ONE sf10 run, and the board would pay it twice (dump +
# DuckDB pair-join replay, the latter spill-infeasible at sf10 per the
# sf3 experience). Their pipelines are certified at sf10 by the
# probe-bounded slice twins in the 16-query gate
# (artifacts/correctness_sf10_r13.json and the r14 recall-floor gate).
# The three pair-bound-ENGINE slice twins — the distinct queries
# neardup_clusters_bigstar_slice, ingest_dedup_fold_slice, and
# index_compact_slice (NOT the full bigstar/fold/compact queries,
# which are in the 15-entry list below) — stay ON the board: the r14
# sf10 gate already ran their engine+oracle at sf10 green, so they
# are board-feasible — only the 15 FULL queries are excluded.
PAIRBOUND="minhash_neardup minhash_incremental minhash_incremental_indexed \
shingle_containment neardup_clusters neardup_clusters_indexed \
neardup_clusters_bigstar index_retract ingest_dedup_fold index_compact \
corpus_pipeline_funnel corpus_rejection_ledger training_set_select_neardup \
train_eval_split_neardup embedding_neardup_lsh"
for q in $PAIRBOUND; do
  grep -q "^$q	" "$VERDICTS" 2>/dev/null || \
    printf '%s\tpairbound_excluded_slice_certified_sf10\n' "$q" >> "$VERDICTS"
done
ONLY=$(python3 -c "
import json
pb = set('''$PAIRBOUND'''.split())
qs = sorted(json.load(open('CORRECTNESS_r14.json')))
print(','.join(q for q in qs if q not in pb))")

if [ ! -f "$OUT/oracle_sql.json" ]; then
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
  SPARK_GRAFT_ONLY="$ONLY" \
    sbt -batch "runMain graft.Verify $SF $OUT" \
    > /tmp/verify_sf10_full_r15_sbt.log 2>&1 || {
      tail -20 /tmp/verify_sf10_full_r15_sbt.log; exit 1; }
fi

# dump-completeness check, fresh run or rerun alike (r13 advice): a
# query that threw during Verify leaves no parquet dir but IS in
# oracle_sql.json — record those as engine-side verdicts, do not
# silently replay a partial board
python3 - "$OUT" "$VERDICTS" <<'EOF'
import json, os, sys
out, verdicts = sys.argv[1], sys.argv[2]
qs = json.load(open(os.path.join(out, "oracle_sql.json")))
missing = [q for q in sorted(qs) if not os.path.isdir(os.path.join(out, q))]
if missing:
    with open(verdicts, "a") as f:
        for q in missing:
            f.write(f"{q}\tengine_dump_missing\n")
    print("ENGINE DUMP MISSING (recorded):", *missing, sep="\n  ")
EOF

QUERIES=$(python3 -c "
import json
print('\n'.join(sorted(json.load(open('$OUT/oracle_sql.json')))))")

for q in $QUERIES; do
  chunk=/tmp/cc_sf10_r15_$q.json
  if [ -s "$chunk" ]; then echo "skip $q (chunk exists)"; continue; fi
  if grep -q "^$q	" "$VERDICTS" 2>/dev/null; then
    echo "skip $q (verdict recorded)"; continue; fi
  if [ ! -d "$OUT/$q" ]; then continue; fi   # recorded above
  free_gb=$(df -BG "$SF" | awk 'NR==2{gsub("G","",$4); print $4}')
  if [ "$free_gb" -lt "$FLOOR" ]; then
    echo -e "$q\tskipped_disk_floor_${free_gb}GB" >> "$VERDICTS"
    echo "SKIP $q: only ${free_gb} GB free (< ${FLOOR})"; continue
  fi
  echo "=== oracle: $q ($(date +%H:%M:%S), free: ${free_gb}G)"
  timeout -k 30 "${GRAFT_ORACLE_TIMEOUT:-5400}" \
    env GRAFT_DUCK_MEM=${GRAFT_DUCK_MEM:-45GB} GRAFT_JSON_OUT="$chunk" \
    python3 tools/check_oracles.py "$SF" "$OUT" "$q"
  rc=$?
  if [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
    echo -e "$q\ttimeout_${GRAFT_ORACLE_TIMEOUT:-5400}s" >> "$VERDICTS"
    rm -f "$chunk"
  elif [ "$rc" -ne 0 ] && [ ! -s "$chunk" ]; then
    # checker died before writing a chunk (ENOSPC kills duckdb hard)
    echo -e "$q\tchecker_died_rc${rc}" >> "$VERDICTS"
  fi
done
echo "== sf10 full-board chunks done; verdicts: =="
cat "$VERDICTS" 2>/dev/null || echo "(none — every query attempted)"
echo "== consolidate with: =="
echo "python3 - <<'PY'"
echo "import json;qs=json.load(open('$OUT/oracle_sql.json'))"
echo "ex={l.split('\t')[0] for l in open('$VERDICTS')} if __import__('os').path.exists('$VERDICTS') else set()"
echo "json.dump({k:v for k,v in qs.items() if k not in ex},open('/tmp/sf10_expected.json','w'))"
echo "PY"
echo "python3 tools/consolidate_chunks.py '/tmp/cc_sf10_r15_*.json' CORRECTNESS_sf10_r15.json /tmp/sf10_expected.json"
