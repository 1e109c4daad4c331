#!/usr/bin/env bash
# The parameterized CORRECTNESS GATE (r15 verdict #8): one entry point
# for every full-board certification rung, superseding the per-round
# sf{1,3,10}_gate_r*.sh / sf10_full_board_r15.sh variants (git keeps
# the historical copies; this is the canonical protocol).
#
#   tools/gate.sh SF_DIR [--tag TAG] [--out DIR] [--exclusions FILE]
#                 [--census FILE] [--only LIST]
#
#   SF_DIR        parquet fixture dir (tools/FIXTURES.md rungs, or
#                 /root/testdata/sf0.01 for the driver rung)
#   --tag TAG     chunk/verdict namespace (default: SF_DIR basename +
#                 git short head) — chunks land in /tmp/cc_<TAG>_<q>.json,
#                 verdicts in /tmp/<TAG>_verdicts.txt; both durable, so
#                 an interrupted gate RESUMES where it stopped
#   --exclusions  two-column TSV "<query>\t<reason>" — each query is
#                 recorded as a verdict (not attempted) and dropped
#                 from the Verify dump; e.g. artifacts/sf10_r15_exclusions.txt
#   --census FILE JSON whose keys are the full declared-query set
#                 (default: newest CORRECTNESS_r*.json in the repo) —
#                 only consulted when --exclusions needs a complement
#   --only LIST   comma-separated subset (changed-query re-gates)
#
# Protocol (the shape sf3 r14 + sf10 r15 converged on):
#   1. One Verify dump of the selected set (skipped when
#      $OUT/oracle_sql.json exists; per-query re-dump via --only into
#      a fresh --out).
#   2. Dump-completeness check: a query that threw during Verify is in
#      oracle_sql.json but has no parquet dir — recorded as an
#      engine-side verdict, never silently replayed as a partial board.
#   3. Every oracled query replayed SERIALLY in DuckDB, one durable
#      chunk per query, with per-query guard rails:
#        - disk floor on the DATA filesystem ($GRAFT_DISK_FLOOR_GB,
#          default 20) — below it the query is SKIPPED and recorded;
#        - wall clock ($GRAFT_ORACLE_TIMEOUT, default 5400 s) — a
#          timeout lands as a recorded verdict, never a hang.
#   4. Prints the consolidate_chunks.py command that folds the green
#      chunks + exclusions into CORRECTNESS_<TAG>.json.
#
# Heavy rungs: run serially with any Spark job (the DuckDB replays
# take $GRAFT_DUCK_MEM, default 45GB), sweep between rungs with
# tools/sweep_scratch.sh.
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:?usage: tools/gate.sh SF_DIR [--tag TAG] [--out DIR] [--exclusions FILE] [--census FILE] [--only LIST]}
shift
TAG="" ; OUT="" ; EXCL="" ; CENSUS="" ; ONLY=""
while [ $# -gt 0 ]; do
  case "$1" in
    --tag) TAG=$2; shift 2;;
    --out) OUT=$2; shift 2;;
    --exclusions) EXCL=$2; shift 2;;
    --census) CENSUS=$2; shift 2;;
    --only) ONLY=$2; shift 2;;
    *) echo "unknown arg: $1" >&2; exit 2;;
  esac
done
TAG=${TAG:-$(basename "$SF")_$(git rev-parse --short HEAD 2>/dev/null || echo head)}
OUT=${OUT:-/tmp/verify_$TAG}
VERDICTS=/tmp/${TAG}_verdicts.txt
FLOOR=${GRAFT_DISK_FLOOR_GB:-20}

# exclusions: record each as a verdict and build the dump complement
if [ -n "$EXCL" ]; then
  [ -f "$EXCL" ] || { echo "exclusions file not found: $EXCL" >&2; exit 2; }
  while IFS=$'\t' read -r q reason; do
    [ -n "$q" ] || continue
    grep -q "^$q	" "$VERDICTS" 2>/dev/null || \
      printf '%s\t%s\n' "$q" "${reason:-excluded}" >> "$VERDICTS"
  done < "$EXCL"
  if [ -z "$ONLY" ]; then
    CENSUS=${CENSUS:-$(ls -1 CORRECTNESS_r*.json 2>/dev/null | sort -V | tail -1)}
    [ -n "$CENSUS" ] || { echo "--exclusions needs --census (no CORRECTNESS_r*.json found)" >&2; exit 2; }
    ONLY=$(python3 -c "
import json, sys
ex = {l.split('\t')[0] for l in open('$EXCL') if l.strip()}
print(','.join(q for q in sorted(json.load(open('$CENSUS'))) if q not in ex))")
  fi
fi

if [ ! -f "$OUT/oracle_sql.json" ]; then
  env SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24} \
  ${ONLY:+SPARK_GRAFT_ONLY="$ONLY"} \
    sbt -batch "runMain graft.Verify $SF $OUT" \
    > /tmp/verify_${TAG}_sbt.log 2>&1 || {
      tail -20 /tmp/verify_${TAG}_sbt.log; exit 1; }
fi

# dump-completeness: engine-side failures become recorded verdicts
python3 - "$OUT" "$VERDICTS" <<'EOF'
import json, os, sys
out, verdicts = sys.argv[1], sys.argv[2]
qs = json.load(open(os.path.join(out, "oracle_sql.json")))
missing = [q for q in sorted(qs) if not os.path.isdir(os.path.join(out, q))]
if missing:
    seen = set()
    if os.path.exists(verdicts):
        seen = {l.split("\t")[0] for l in open(verdicts) if l.strip()}
    with open(verdicts, "a") as f:
        for q in missing:
            if q not in seen:
                f.write(f"{q}\tengine_dump_missing\n")
    print("ENGINE DUMP MISSING (recorded):", *missing, sep="\n  ")
EOF

QUERIES=$(python3 -c "
import json
print('\n'.join(sorted(json.load(open('$OUT/oracle_sql.json')))))")

for q in $QUERIES; do
  chunk=/tmp/cc_${TAG}_$q.json
  if [ -s "$chunk" ]; then echo "skip $q (chunk exists)"; continue; fi
  if grep -q "^$q	" "$VERDICTS" 2>/dev/null; then
    echo "skip $q (verdict recorded)"; continue; fi
  [ -d "$OUT/$q" ] || continue   # recorded above
  free_gb=$(df -BG "$SF" | awk 'NR==2{gsub("G","",$4); print $4}')
  if [ "$free_gb" -lt "$FLOOR" ]; then
    echo -e "$q\tskipped_disk_floor_${free_gb}GB" >> "$VERDICTS"
    echo "SKIP $q: only ${free_gb} GB free (< ${FLOOR})"; continue
  fi
  echo "=== oracle: $q ($(date +%H:%M:%S), free: ${free_gb}G)"
  timeout -k 30 "${GRAFT_ORACLE_TIMEOUT:-5400}" \
    env GRAFT_DUCK_MEM=${GRAFT_DUCK_MEM:-45GB} GRAFT_JSON_OUT="$chunk" \
    python3 tools/check_oracles.py "$SF" "$OUT" "$q"
  rc=$?
  if [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
    echo -e "$q\ttimeout_${GRAFT_ORACLE_TIMEOUT:-5400}s" >> "$VERDICTS"
    rm -f "$chunk"
  elif [ "$rc" -ne 0 ] && [ ! -s "$chunk" ]; then
    # checker died before writing a chunk (ENOSPC kills duckdb hard)
    echo -e "$q\tchecker_died_rc${rc}" >> "$VERDICTS"
  fi
done
echo "== gate '$TAG' chunks done; verdicts: =="
cat "$VERDICTS" 2>/dev/null || echo "(none — every query attempted)"
echo "== consolidate with: =="
echo "python3 - <<'PY'"
echo "import json, os; qs=json.load(open('$OUT/oracle_sql.json'))"
echo "ex={l.split('\t')[0] for l in open('$VERDICTS') if l.strip()} if os.path.exists('$VERDICTS') else set()"
echo "json.dump({k:v for k,v in qs.items() if k not in ex},open('/tmp/${TAG}_expected.json','w'))"
echo "PY"
echo "python3 tools/consolidate_chunks.py '/tmp/cc_${TAG}_*.json' CORRECTNESS_${TAG}.json /tmp/${TAG}_expected.json"
