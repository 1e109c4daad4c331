#!/usr/bin/env bash
# Round-13 sf10 oracle rung: hash-certify every round-changed query at
# the rung where ladders/caps/sampling are active — the 8 NEW
# probe-sliced certification twins (r12 verdict #1: the pair-bound
# family's only path to certification above sf3), the schema-changed
# knn_graph_recall (over_cap_buckets), and the IVF/PQ family whose
# seed selection was made distributed this round (bit-identity proved
# by retraining against the unchanged oracle — clear the sf corpus's
# ivf_centroids/pq_* artifacts first if you want the training path,
# not the stored artifact, under test). Serial heavy-oracle protocol:
# one durable JSON chunk per query.
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/tmp/graft_data/sf10}
OUT=${2:-/tmp/verify_sf10_r13}
TAG=$(basename "$SF")
QUERIES=(
  knn_graph_recall knn_graph_lsh_slice
  minhash_neardup_slice shingle_containment_slice
  neardup_clusters_slice neardup_clusters_indexed_slice
  neardup_clusters_bigstar_slice
  ingest_dedup_fold_slice index_compact_slice
  similar_ann_ivf embedding_cluster_balance
)

if [ ! -f "$OUT/oracle_sql.json" ]; then
  ONLY=$(IFS=,; echo "${QUERIES[*]}")
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} SPARK_GRAFT_CPUS=24 SPARK_GRAFT_ONLY="$ONLY" \
    sbt -batch "runMain graft.Verify $SF $OUT" \
    > /tmp/verify_${TAG}_r13_sbt.log 2>&1 || {
      tail -20 /tmp/verify_${TAG}_r13_sbt.log; exit 1; }
  if grep -q '\[verify\]' /tmp/verify_${TAG}_r13_sbt.log; then
    grep '\[verify\]' /tmp/verify_${TAG}_r13_sbt.log >&2
    echo "GATE: a query threw during Verify" >&2; exit 1
  fi
fi

for q in "${QUERIES[@]}"; do
  chunk=/tmp/cc_${TAG}_r13_$q.json
  if [ -s "$chunk" ]; then echo "skip $q (chunk exists)"; continue; fi
  echo "=== oracle: $q ($(date +%H:%M:%S), free: $(df -h / | awk 'NR==2{print $4}'))"
  GRAFT_DUCK_MEM=${GRAFT_DUCK_MEM:-100GB} GRAFT_JSON_OUT="$chunk" \
    python3 tools/check_oracles.py "$SF" "$OUT" "$q" || true
  rm -rf /tmp/duck_spill_* 2>/dev/null
done
echo "$TAG r13 gate chunks done"
