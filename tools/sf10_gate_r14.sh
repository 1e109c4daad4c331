#!/usr/bin/env bash
# Round-14 sf10 certification gate: the 8 probe-sliced twins (the
# pair-bound family's scale-rung oracles — the full-query DuckDB
# replays are spill-disk-infeasible above sf3) plus the IVF/PQ family
# and the recall censuses.
#
# r13-verdict #4 addition: the gate now ASSERTS the cap-binding recall
# floor from the dumped knn_graph_recall census — recall mean ≥ 0.95
# while over_cap_buckets > 0 rows exist (the regime where the number
# certifies KnnBucketCap, not just the banding). A cap regression can
# no longer ship behind a green hash row: the hash only proves engine
# and oracle agree, the floor proves the agreed number is acceptable.
#
# r13-advice fix: the dump-completeness check (a query that threw
# during Verify leaves no parquet dir but IS in oracle_sql.json) runs
# on fresh runs AND reruns, outside the fresh-Verify branch.
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/tmp/graft_data/sf10}
OUT=${2:-/tmp/verify_sf10_r14}
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
    > /tmp/verify_sf10_r14_sbt.log 2>&1 || {
      tail -20 /tmp/verify_sf10_r14_sbt.log; exit 1; }
fi

for q in "${QUERIES[@]}"; do
  if [ ! -d "$OUT/$q" ]; then
    echo "SF10 GATE: parquet dump missing for $q" >&2
    grep '\[verify\]' /tmp/verify_sf10_r14_sbt.log >&2 2>/dev/null || true
    exit 1
  fi
done

# cap-binding recall floor (r13 verdict #4): fail loudly when the
# census says the cap is binding (over_cap_buckets > 0 anywhere) but
# mean recall fell below 0.95 — the KnnBucketCap quality contract
python3 - "$OUT/knn_graph_recall" <<'EOF'
import sys
import pandas as pd
df = pd.read_parquet(sys.argv[1])
mean_recall = df["recall"].mean()
over = int((df["over_cap_buckets"] > 0).sum())
print(f"knn_graph_recall census: mean recall {mean_recall:.4f}, "
      f"{over}/{len(df)} probes with over-cap buckets, "
      f"total over_cap_buckets {int(df['over_cap_buckets'].sum())}")
if over > 0 and mean_recall < 0.95:
    print("SF10 GATE: CAP-BINDING RECALL FLOOR VIOLATED - "
          f"mean recall {mean_recall:.4f} < 0.95 while the cap is "
          "binding; a KnnBucketCap/ladder regression reached sf10",
          file=sys.stderr)
    sys.exit(1)
if over == 0:
    print("note: cap dormant at this rung (over_cap_buckets all 0) - "
          "the floor certifies banding only, not the cap")
EOF

for q in "${QUERIES[@]}"; do
  chunk=/tmp/cc_sf10_r14_$q.json
  if [ -s "$chunk" ]; then echo "skip $q (chunk exists)"; continue; fi
  echo "=== oracle: $q ($(date +%H:%M:%S), free: $(df -h / | awk 'NR==2{print $4}'))"
  # no glob-rm of /tmp/duck_spill_* here: check_oracles.py cleans its
  # own per-pid spill dir at exit, and the glob deletes a CONCURRENT
  # checker's live spill mid-query (the r14 sf3 incident)
  GRAFT_DUCK_MEM=${GRAFT_DUCK_MEM:-100GB} GRAFT_JSON_OUT="$chunk" \
    python3 tools/check_oracles.py "$SF" "$OUT" "$q" || true
done
echo "sf10 r14 gate chunks done"
