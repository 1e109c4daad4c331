#!/usr/bin/env python3
"""Consolidate the sf3 oracle chunks into CORRECTNESS_sf3_r10.json.

Inputs: the round-9 durable chunks (/tmp/cc_sf3_light.json + the
/tmp/cc_sf3_h_*.json heavy singles) and the round-10 completion chunks
(/tmp/cc_sf3_r10_*.json). Round-10 results win on overlap (they were
run against the current code). Refuses to write if any oracled query
is missing or failing, so the committed artifact can only ever be a
full green board — a partial run stays in chunks, visibly unfinished.
"""
import glob
import json
import sys

EXPECTED_NO_ORACLE = set()  # no-oracle queries never enter these chunks

def main(out_path):
    merged = {}
    srcs = (sorted(glob.glob("/tmp/cc_sf3_light.json")) +
            sorted(glob.glob("/tmp/cc_sf3_h_*.json")) +
            sorted(glob.glob("/tmp/cc_sf3_r10_*.json")))
    for f in srcs:
        merged.update(json.load(open(f)))
    oracles = json.load(open("/tmp/verify_sf3_r10/oracle_sql.json"))
    # the r10 Verify run was restricted to the missing queries; the
    # full oracle census comes from the repo itself
    sys.path.insert(0, "tools")
    full = set(merged) | set(oracles)
    bad = {k: v for k, v in merged.items()
           if not (v.get("rows_match") and v.get("schema_match")
                   and v.get("hash_match"))}
    if bad:
        print("REFUSING to consolidate - failing rows:")
        for k, v in bad.items():
            print(f"  {k}: {v.get('err')}")
        return 1
    n_expected = int(sys.argv[2]) if len(sys.argv) > 2 else 168
    if len(merged) != n_expected:
        print(f"REFUSING to consolidate - {len(merged)} green rows, "
              f"expected {n_expected}")
        missing = sorted(full - set(merged))
        print("covered-but-missing:", missing)
        return 1
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}: {len(merged)} queries, all green")
    return 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
