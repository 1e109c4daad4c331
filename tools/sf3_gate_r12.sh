#!/usr/bin/env bash
# Round-12 changed-query certification at sf3 (the r10 full-board rows for the IVF family are stale here: sampled training changes results at sf3) — the rung where the new
# SAMPLED IVF/PQ training is ACTIVE (trainEvery(60000) = 14), so these
# oracles certify the sampled-training replay for real, not the
# identity regime. Serial heavy-oracle protocol (BASELINE.md): one
# durable JSON chunk per query.
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/tmp/graft_data/sf3}
OUT=${2:-/tmp/verify_sf3_r12}
QUERIES=(
  similar_ann_ivf similar_ann_ivfpq embedding_pq_codes
  embedding_pq_codes_indexed embedding_cluster_balance
  embedding_drift_psi semdedup_prune ann_recall
  knn_graph_recall snapshot_expire minhash_recall
)

if [ ! -f "$OUT/oracle_sql.json" ]; then
  ONLY=$(IFS=,; echo "${QUERIES[*]}")
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_CPUS=24 SPARK_GRAFT_ONLY="$ONLY" \
    sbt -batch "runMain graft.Verify $SF $OUT" \
    > /tmp/verify_sf3_r12_sbt.log 2>&1 || {
      tail -20 /tmp/verify_sf3_r12_sbt.log; exit 1; }
  if grep -q '\[verify\]' /tmp/verify_sf3_r12_sbt.log; then
    grep '\[verify\]' /tmp/verify_sf3_r12_sbt.log >&2
    echo "SF1 GATE: a query threw during Verify" >&2; exit 1
  fi
fi

for q in "${QUERIES[@]}"; do
  chunk=/tmp/cc_sf3_r12_$q.json
  if [ -s "$chunk" ]; then echo "skip $q (chunk exists)"; continue; fi
  echo "=== oracle: $q ($(date +%H:%M:%S), free: $(df -h / | awk 'NR==2{print $4}'))"
  GRAFT_DUCK_MEM=${GRAFT_DUCK_MEM:-100GB} GRAFT_JSON_OUT="$chunk" \
    python3 tools/check_oracles.py "$SF" "$OUT" "$q" || true
  rm -rf /tmp/duck_spill_* 2>/dev/null
done
echo "sf3 r12 gate chunks done"
