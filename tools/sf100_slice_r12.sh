#!/usr/bin/env bash
# Round-12 sf100 slice: the vector family under SAMPLED training plus
# the round's new queries, cold (fresh JVM, swept artifact store,
# reps=1 — the sliced sf100 protocol of bench_sf100_r11_scale.json).
# Comparisons this run exists for:
#   - knn_bucket_audit at the corpus that motivated it (f≈1000
#     families) — the committed row round-11 verdict #6 asked for;
#   - ann_recall / similar_ann_ivf cold vs round-11's full-corpus
#     training (290 s / 52.4 s): the sampled-training shrink at the
#     top rung.
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/tmp/graft_data/sf100}
OUT=${2:-/tmp/bench_sf100_r12_slice.json}

# sweep ONLY the artifact store + warehouse caches (cold-build
# semantics), NOT the full sweep_scratch — that one also reclaims the
# /tmp/graft_data corpora themselves (regenerable, but 15 min of
# gen_sf.py this script should not force)
rm -rf "/tmp/graft_index_$(id -un)" spark-warehouse/graft_bucketed_* 2>/dev/null || true

SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_TIER=scale \
SPARK_GRAFT_ONLY=knn_bucket_audit,ann_recall,similar_ann_ivf,similar_ann_ivfpq,embedding_pq_codes_indexed,embedding_cluster_balance,embedding_drift_psi,knn_graph_recall,snapshot_expire,snapshot_read_asof \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' \
  | sed 's/^\[info\] //' > "$OUT"
echo "wrote $OUT"
