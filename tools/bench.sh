#!/usr/bin/env bash
# The parameterized BENCH RUNNER (r15 verdict #8): one entry point for
# every bench rung, superseding the per-round sf30_slices_r14.sh /
# sf100_slice_r12.sh / ad-hoc env-var incantations (git keeps the
# historical copies).
#
#   tools/bench.sh SF_DIR [--tier all|shipping|scale] [--only LIST]
#                  [--out FILE] [--reps N] [--timeout SECS]
#
# Tier semantics (src/main/scala/graft/Bench.scala):
#   all       every declared query — the sf0.1 close-board default
#   shipping  minus the quadratic AUDIT baselines — the sf1+ headline
#   scale     shipping minus the pair-bound family — the sf30+ rung
#
# Run on an otherwise idle box (check uptime); one rep per fresh JVM
# is NOT what this does — Bench reps share a JVM and report first/min,
# so rep 1 carries JVM+codegen warmup (use queries_min for anchors).
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:?usage: tools/bench.sh SF_DIR [--tier T] [--only LIST] [--out FILE] [--reps N] [--timeout SECS]}
shift
TIER=all; ONLY=""; OUT=""; REPS=3; TO=""
while [ $# -gt 0 ]; do
  case "$1" in
    --tier) TIER=$2; shift 2;;
    --only) ONLY=$2; shift 2;;
    --out) OUT=$2; shift 2;;
    --reps) REPS=$2; shift 2;;
    --timeout) TO=$2; shift 2;;
    *) echo "unknown arg: $1" >&2; exit 2;;
  esac
done
OUT=${OUT:-artifacts/bench_$(basename "$SF")_${TIER}_$(git rev-parse --short HEAD 2>/dev/null || echo head).json}

uptime
${TO:+timeout -k 30 $TO} env \
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
  SPARK_GRAFT_BENCH_REPS="$REPS" SPARK_GRAFT_BENCH_TIER="$TIER" \
  SPARK_GRAFT_BENCH_OUT="$OUT" \
  ${ONLY:+SPARK_GRAFT_ONLY="$ONLY"} \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep metric
echo "wrote $OUT"
