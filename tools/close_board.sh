#!/usr/bin/env bash
# The parameterized CLOSE PROTOCOL (r15 verdict #8), superseding
# close_board_r14.sh / close_board_r15.sh (git keeps them). A round's
# closing board SHIPS only if every enforcement step passes:
#
#   1. tools/check_claims.py — every artifact path (and every headline
#      number it can parse) cited by SURVEY.md / BASELINE.md /
#      TESTDATA.md matches the committed artifacts;
#   2. the full-board bench at sf0.1 (reps=3) completes;
#   3. bench_diff vs the standing sf0.1 quiet anchor reports NO
#      movers, OR --triage names a committed file mentioning every
#      mover by name (the r15 adjudication contract: an empty
#      src/main diff vs the anchor commit + disjoint mover sets across
#      reruns = environment, by construction);
#   4. (when an sf1 anchor exists) the sf1 SHIPPING-tier board runs
#      and bench_diffs against it under the same mover contract —
#      scale-tier regressions surface at close, not when a rung gate
#      happens to re-run (r15 verdict #3).
#
#   tools/close_board.sh --since REF [--out FILE] [--anchor FILE]
#       [--triage FILE] [--sf1-anchor FILE] [--sf1-out FILE] [--no-sf1]
#
# --since is the round-boundary git ref bench_diff uses to label
# movers touched/untouched. Run on an otherwise idle box; check
# uptime before trusting numbers.
set -euo pipefail
cd "$(dirname "$0")/.."

SINCE=""; OUT=""; ANCHOR=""; TRIAGE=""; SF1_ANCHOR=""; SF1_OUT=""; SF1=1
while [ $# -gt 0 ]; do
  case "$1" in
    --since) SINCE=$2; shift 2;;
    --out) OUT=$2; shift 2;;
    --anchor) ANCHOR=$2; shift 2;;
    --triage) TRIAGE=$2; shift 2;;
    --sf1-anchor) SF1_ANCHOR=$2; shift 2;;
    --sf1-out) SF1_OUT=$2; shift 2;;
    --no-sf1) SF1=0; shift;;
    *) echo "unknown arg: $1" >&2; exit 2;;
  esac
done
[ -n "$SINCE" ] || { echo "--since REF is required (round-boundary commit)" >&2; exit 2; }
ANCHOR=${ANCHOR:-$(ls -1 artifacts/bench_r*_quiet_sf0.1.json 2>/dev/null | sort -V | tail -1)}
[ -n "$ANCHOR" ] && [ -f "$ANCHOR" ] || { echo "no quiet sf0.1 anchor found; pass --anchor" >&2; exit 2; }
OUT=${OUT:-artifacts/bench_closing_sf0.1_$(git rev-parse --short HEAD).json}
SF1_ANCHOR=${SF1_ANCHOR:-$(ls -1 artifacts/bench_r*_sf1.json 2>/dev/null | sort -V | tail -1)}

check_movers() {  # $1 = diff output; every MOVER must appear in $TRIAGE
  local diff_out=$1 rc=$2 label=$3
  if [ "$rc" -ne 0 ]; then
    if [ -z "$TRIAGE" ] || [ ! -f "$TRIAGE" ]; then
      echo "CLOSE FAIL ($label): movers reported and no triage file supplied." >&2
      echo "Root-cause each mover, commit the triage text, re-run with --triage FILE" >&2
      exit 1
    fi
    local missing
    missing=$(echo "$diff_out" | awk '/^MOVER /{print $2}' | sed 's/:$//' | \
              while read -r q; do grep -q "$q" "$TRIAGE" || echo "$q"; done)
    if [ -n "$missing" ]; then
      echo "CLOSE FAIL ($label): triage file $TRIAGE does not mention:" >&2
      echo "$missing" >&2
      exit 1
    fi
    echo "($label) movers acknowledged by $TRIAGE"
  fi
}

echo "== claims gate =="
python3 tools/check_claims.py

uptime
echo "== sf0.1 full board =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
SPARK_GRAFT_BENCH_REPS=${SPARK_GRAFT_BENCH_REPS:-3} \
SPARK_GRAFT_BENCH_OUT="$OUT" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep metric

echo "== bench_diff vs $ANCHOR =="
DIFF_OUT=$(python3 tools/bench_diff.py "$ANCHOR" "$OUT" --since "$SINCE" --fail-on-movers) && rc=0 || rc=$?
echo "$DIFF_OUT"
check_movers "$DIFF_OUT" "$rc" "sf0.1"
echo "wrote $OUT"

if [ "$SF1" -eq 1 ] && [ -n "$SF1_ANCHOR" ] && [ -f "$SF1_ANCHOR" ] \
   && [ -d /tmp/graft_data/sf1 ]; then
  SF1_OUT=${SF1_OUT:-artifacts/bench_closing_sf1_$(git rev-parse --short HEAD).json}
  echo "== sf1 shipping board (anchor: $SF1_ANCHOR) =="
  SPARK_GRAFT_SF_DIR=/tmp/graft_data/sf1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
  SPARK_GRAFT_BENCH_REPS=${SPARK_GRAFT_BENCH_REPS:-3} \
  SPARK_GRAFT_BENCH_TIER=shipping SPARK_GRAFT_BENCH_OUT="$SF1_OUT" \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep metric
  DIFF_OUT=$(python3 tools/bench_diff.py "$SF1_ANCHOR" "$SF1_OUT" --since "$SINCE" --fail-on-movers) && rc=0 || rc=$?
  echo "$DIFF_OUT"
  check_movers "$DIFF_OUT" "$rc" "sf1"
  echo "wrote $SF1_OUT"
elif [ "$SF1" -eq 1 ]; then
  echo "== sf1 rung skipped (no anchor or no /tmp/graft_data/sf1 fixture — see tools/FIXTURES.md) =="
fi
