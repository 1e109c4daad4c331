#!/usr/bin/env bash
# Round-14 sf30 bench rows for the queries that ENTERED the scale tier
# this round (r13 verdict #7's done criterion): the cluster slices'
# engine plans now run the probe-seeded BFS closure instead of
# filtering a global CC, so they must demonstrate a bench row at a
# rung the pair-bound tier excludes. Runs the full slice family (the
# still-pair-bound bigstar/fold/compact slices are NOT here — they
# remain sf30-excluded by design) plus hier_cluster_balance (C=146 >
# IvfCells at sf30, so the forced two-level path is multi-group).
# Data: tools/gen_sf.py at M=300 (sf30: 600k embeddings, 1.5M docs).
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/tmp/graft_data/sf30}
OUT=${2:-artifacts/bench_sf30_r14_slices.json}

SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
SPARK_GRAFT_BENCH_REPS=${SPARK_GRAFT_BENCH_REPS:-3} \
SPARK_GRAFT_BENCH_OUT="$OUT" \
SPARK_GRAFT_ONLY=neardup_clusters_slice,neardup_clusters_indexed_slice,minhash_neardup_slice,shingle_containment_slice,knn_graph_lsh_slice,hier_cluster_balance \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep metric
echo "wrote $OUT"
