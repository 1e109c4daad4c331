#!/usr/bin/env bash
# Round-15 sf10 feasibility rows for the FULL pair-bound family
# (r14 verdict #7): the slice twins are correctness-certified at sf10
# and benched at sf30, but the full queries' Sigma-f^2 wall was only
# characterized at sf1/sf3 — one committed bench row (or a recorded
# timeout/ENOSPC verdict) per family member documents where the wall
# actually binds. One query per JVM so a timeout records a verdict for
# THAT query instead of killing the batch; reps=1 (feasibility, not a
# tuning board). Merge with the printed consolidation snippet.
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/tmp/graft_data/sf10}
VERDICTS=/tmp/sf10_pb_verdicts.txt
TO=${GRAFT_PB_TIMEOUT:-1500}

# The three the verdict names first, then one representative per
# sub-family (index lifecycle, star mode, streaming fold, pipeline
# composition, vector LSH) — the remaining members share these plans.
QUERIES=${GRAFT_PB_QUERIES:-"minhash_neardup neardup_clusters shingle_containment \
minhash_incremental_indexed neardup_clusters_bigstar ingest_dedup_fold \
corpus_pipeline_funnel embedding_neardup_lsh"}

for q in $QUERIES; do
  out=/tmp/bench_sf10_pb_$q.json
  if [ -s "$out" ]; then echo "skip $q (row exists)"; continue; fi
  free_gb=$(df -BG "$SF" | awk 'NR==2{gsub("G","",$4); print $4}')
  if [ "$free_gb" -lt "${GRAFT_DISK_FLOOR_GB:-20}" ]; then
    echo -e "$q\tskipped_disk_floor_${free_gb}GB" >> "$VERDICTS"; continue
  fi
  echo "=== bench: $q ($(date +%H:%M:%S), free ${free_gb}G, timeout ${TO}s)"
  timeout -k 30 "$TO" env \
    SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
    SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_GRAFT_BENCH_OUT="$out" SPARK_GRAFT_ONLY="$q" \
    sbt -batch "runMain graft.Bench" > /tmp/bench_sf10_pb_$q.log 2>&1
  rc=$?
  if [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
    echo -e "$q\ttimeout_${TO}s" >> "$VERDICTS"; rm -f "$out"
    echo "TIMEOUT $q"
  elif [ "$rc" -ne 0 ]; then
    echo -e "$q\tfailed_rc${rc}" >> "$VERDICTS"; tail -5 /tmp/bench_sf10_pb_$q.log
  else
    python3 -c "import json;d=json.load(open('$out'));print(' ', {k:round(v,1) for k,v in d['queries_min'].items()})"
  fi
done
echo "== verdicts: =="; cat "$VERDICTS" 2>/dev/null || echo "(none)"
echo "== consolidate: python3 tools/merge_pb_rows.py =="
