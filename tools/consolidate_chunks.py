#!/usr/bin/env python3
"""Consolidate per-query oracle chunks into one committed artifact.

Generalizes tools/consolidate_sf3.py (which is pinned to the r9/r10
chunk layout): takes a chunk glob, an output path, and the expected
green-row count. Refuses to write unless every chunk row is green and
the count matches, so a committed artifact can only ever be a full
green board — a partial run stays in chunks, visibly unfinished.

Usage: consolidate_chunks.py '<glob>' <out.json> <expected_count>
"""
import glob
import json
import sys


def main(pattern, out_path, n_expected):
    merged = {}
    for f in sorted(glob.glob(pattern)):
        merged.update(json.load(open(f)))
    bad = {k: v for k, v in merged.items()
           if not (v.get("rows_match") and v.get("schema_match")
                   and v.get("hash_match"))}
    if bad:
        print("REFUSING to consolidate - failing rows:")
        for k, v in sorted(bad.items()):
            print(f"  {k}: {v.get('err')}")
        return 1
    if len(merged) != n_expected:
        print(f"REFUSING to consolidate - {len(merged)} green rows, "
              f"expected {n_expected}")
        print("present:", sorted(merged))
        return 1
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}: {len(merged)} queries, all green")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], int(sys.argv[3])))
