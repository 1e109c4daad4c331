#!/usr/bin/env bash
# Round-10 sf3 gate completion (round-9 verdict #1): Spark-side Verify
# for the queries missing from the round-9 durable chunks, then their
# DuckDB oracles run SERIALLY (the heavy-oracle protocol of
# BASELINE.md) with one durable JSON chunk per query, so a crash loses
# at most one oracle's work. Consolidation into CORRECTNESS_sf3_r10
# .json happens in tools/consolidate_sf3.py once every chunk exists.
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/tmp/graft_sf3}
OUT=${2:-/tmp/verify_sf3_r10}
QUERIES=(
  corpus_pipeline_funnel corpus_rejection_ledger embedding_cluster_balance
  embedding_neardup neardup_clusters neardup_clusters_indexed
  ngram_jaccard pagerank_trade_graph semdedup_prune
  similar_ann_ivf similar_ann_ivfpq training_set_select_neardup
  index_retract neardup_clusters_bigstar ann_recall
)

if [ ! -f "$OUT/oracle_sql.json" ]; then
  ONLY=$(IFS=,; echo "${QUERIES[*]}")
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_CPUS=24 SPARK_GRAFT_ONLY="$ONLY" \
    sbt -batch "runMain graft.Verify $SF $OUT" \
    > /tmp/verify_sf3_r10_sbt.log 2>&1 || {
      tail -20 /tmp/verify_sf3_r10_sbt.log; exit 1; }
  if grep -q '\[verify\]' /tmp/verify_sf3_r10_sbt.log; then
    grep '\[verify\]' /tmp/verify_sf3_r10_sbt.log >&2
    echo "SF3 GATE: a query threw during Verify" >&2; exit 1
  fi
fi

for q in "${QUERIES[@]}"; do
  chunk=/tmp/cc_sf3_r10_$q.json
  if [ -s "$chunk" ]; then echo "skip $q (chunk exists)"; continue; fi
  echo "=== oracle: $q ($(date +%H:%M:%S), free: $(df -h / | awk 'NR==2{print $4}'))"
  GRAFT_DUCK_MEM=${GRAFT_DUCK_MEM:-100GB} GRAFT_JSON_OUT="$chunk" \
    python3 tools/check_oracles.py "$SF" "$OUT" "$q" || true
  rm -rf /tmp/duck_spill_* 2>/dev/null
done
echo "sf3 gate chunks done"
