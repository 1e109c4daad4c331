#!/usr/bin/env bash
# Round-13 sf10 certification: the 8 probe-sliced twins (the pair-bound
# family's scale-rung oracles — the full-query DuckDB replays are
# spill-disk-infeasible above sf3, r12 verdict #1), plus every
# round-13-changed query re-certified at sf10: knn_graph_recall (schema
# change: over_cap_buckets), index_expire (new), and the IVF/PQ family
# retrained from scratch under the distributed TakeOrdered seed
# selection (sweep the sf10 ivf_centroids/pq_codebooks/pq_codes
# artifacts first — the oracle replays training, so a hash match IS
# the bit-identity proof for the new seed path at sf10's sampling
# stride).
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/tmp/graft_data/sf10}
OUT=${2:-/tmp/verify_sf10_r13}
QUERIES=(
  minhash_neardup_slice shingle_containment_slice
  neardup_clusters_slice neardup_clusters_indexed_slice
  neardup_clusters_bigstar_slice
  ingest_dedup_fold_slice index_compact_slice
  knn_graph_lsh_slice
  knn_graph_recall index_expire
  similar_ann_ivf similar_ann_ivfpq ann_recall
  embedding_cluster_balance embedding_pq_codes embedding_pq_codes_indexed
)

if [ ! -f "$OUT/oracle_sql.json" ]; then
  ONLY=$(IFS=,; echo "${QUERIES[*]}")
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} SPARK_GRAFT_CPUS=24 SPARK_GRAFT_ONLY="$ONLY" \
    sbt -batch "runMain graft.Verify $SF $OUT" \
    > /tmp/verify_sf10_r13_sbt.log 2>&1 || {
      tail -20 /tmp/verify_sf10_r13_sbt.log; exit 1; }
  if grep -q '\[verify\]' /tmp/verify_sf10_r13_sbt.log; then
    grep '\[verify\]' /tmp/verify_sf10_r13_sbt.log >&2
    echo "SF10 GATE: a query threw during Verify" >&2; exit 1
  fi
fi

for q in "${QUERIES[@]}"; do
  chunk=/tmp/cc_sf10_r13_$q.json
  if [ -s "$chunk" ]; then echo "skip $q (chunk exists)"; continue; fi
  echo "=== oracle: $q ($(date +%H:%M:%S), free: $(df -h / | awk 'NR==2{print $4}'))"
  GRAFT_DUCK_MEM=${GRAFT_DUCK_MEM:-100GB} GRAFT_JSON_OUT="$chunk" \
    python3 tools/check_oracles.py "$SF" "$OUT" "$q" || true
  rm -rf /tmp/duck_spill_* 2>/dev/null
done
echo "sf10 r13 gate chunks done"
