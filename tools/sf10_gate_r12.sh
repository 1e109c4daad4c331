#!/usr/bin/env bash
# Round-12 sf10 oracle rung (round-11 verdict #5): hash-certify the
# scale-sensitive set — banded dedup + recall, connected components,
# the IVF/PQ/kNN ladders and caps, and the merge/snapshot family — at
# the rung where bench probes historically found behavioral cliffs and
# where knnBitsFor/trainEvery leave their sf1 values. Serial
# heavy-oracle protocol (BASELINE.md): one durable JSON chunk per
# query; a crash loses at most one oracle's work. Ordered cheap→heavy
# so early chunks land even if the tail is cut.
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/tmp/graft_data/sf10}
OUT=${2:-/tmp/verify_sf10_r12}
QUERIES=(
  merge_upsert_orders merge_cdc_tombstones snapshot_diff
  snapshot_read_asof snapshot_expire
  lsh_bucket_audit knn_bucket_audit embedding_cluster_balance
  embedding_drift_psi similar_ann_ivf embedding_pq_codes_indexed
  similar_ann_ivfpq ann_recall knn_graph_recall knn_graph_lsh
  embedding_neardup_lsh minhash_recall
  index_compact index_refresh ingest_dedup_fold
  minhash_neardup minhash_incremental_indexed shingle_containment
  neardup_clusters neardup_clusters_indexed neardup_clusters_bigstar
  index_retract semdedup_prune
)

if [ ! -f "$OUT/oracle_sql.json" ]; then
  ONLY=$(IFS=,; echo "${QUERIES[*]}")
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_CPUS=24 SPARK_GRAFT_ONLY="$ONLY" \
    sbt -batch "runMain graft.Verify $SF $OUT" \
    > /tmp/verify_sf10_r12_sbt.log 2>&1 || {
      tail -20 /tmp/verify_sf10_r12_sbt.log; exit 1; }
  if grep -q '\[verify\]' /tmp/verify_sf10_r12_sbt.log; then
    grep '\[verify\]' /tmp/verify_sf10_r12_sbt.log >&2
    echo "SF10 GATE: a query threw during Verify" >&2; exit 1
  fi
fi

for q in "${QUERIES[@]}"; do
  chunk=/tmp/cc_sf10_r12_$q.json
  if [ -s "$chunk" ]; then echo "skip $q (chunk exists)"; continue; fi
  echo "=== oracle: $q ($(date +%H:%M:%S), free: $(df -h / | awk 'NR==2{print $4}'))"
  GRAFT_DUCK_MEM=${GRAFT_DUCK_MEM:-100GB} GRAFT_JSON_OUT="$chunk" \
    python3 tools/check_oracles.py "$SF" "$OUT" "$q" || true
  rm -rf /tmp/duck_spill_* 2>/dev/null
done
echo "sf10 r12 gate chunks done"
