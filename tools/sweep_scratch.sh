#!/usr/bin/env bash
# Reclaim the engine's regenerable scratch state (the round-8/9 ENOSPC
# lesson: long scale runs die on DISK, and every byte below is derived,
# fingerprint-keyed state a later run rebuilds on demand).
#
#   sweep_scratch.sh            # report sizes only
#   sweep_scratch.sh --apply    # delete
#
# What it sweeps and why it is safe:
#   spark-warehouse/graft_bucketed_*  bucketed-table caches, keyed by
#                                     (corpus path, rows, crc) — rebuilt
#                                     by the next bucketed-join query
#   /tmp/graft_index_$USER/           IndexStore artifacts (bands, PQ
#                                     codes, CC labels) — content-keyed,
#                                     rebuilt on first read
#   /tmp/graft_data/sf*               gen_sf.py scale corpora — exactly
#                                     regenerated (deterministic, byte-
#                                     stable) by tools/gen_sf.py
#
# NOT swept: /root/testdata (driver-owned), anything inside the repo
# besides spark-warehouse.
set -euo pipefail
cd "$(dirname "$0")/.."

#   /tmp/graft_{binary,json,csv,orc,avro,gzip}_*  source round-trip
#                                     staging dirs — content-keyed
#                                     caches, rebuilt on first query;
#                                     the sf100 binary staging alone is
#                                     ~20 GB and starved a later bench
#                                     slice of disk (round-11 lesson)
APPLY=${1:-}
targets=()
[ -d spark-warehouse ] && targets+=(spark-warehouse)
[ -d "/tmp/graft_index_$(id -un)" ] && targets+=("/tmp/graft_index_$(id -un)")
[ -d /tmp/graft_data ] && targets+=(/tmp/graft_data)
for d in /tmp/graft_binary_* /tmp/graft_json_* /tmp/graft_csv_* \
         /tmp/graft_orc_* /tmp/graft_avro_* /tmp/graft_gzip_*; do
  [ -d "$d" ] && targets+=("$d")
done

if [ ${#targets[@]} -eq 0 ]; then echo "nothing to sweep"; exit 0; fi
du -sh "${targets[@]}"
if [ "$APPLY" = "--apply" ]; then
  rm -rf "${targets[@]}"
  echo "swept."
else
  echo "(dry run — pass --apply to delete)"
fi
