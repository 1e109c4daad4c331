#!/usr/bin/env python3
"""Scale the driver-generated parquet tables by an integer factor M
(default 10: sf0.1 -> sf1) for the scale-cliff audit (VERDICT r6 #1).

Method: M disjoint key-shifted copies of every growing table — copy k
offsets each key domain by k * <table cardinality>, so join fan-outs,
group counts, and dup-family sizes scale LINEARLY like a real larger
corpus, instead of multiplying duplicate keys (which would scale some
joins quadratically). region/nation stay fixed (TPC-H holds these dims
constant across SFs). Name columns that are 1:1 with a key (c_name,
s_name) are regenerated from the shifted key so name-keyed GROUP BYs
keep one group per entity. Document text gets a 3-char copy suffix so
exact-dup families stay per-copy (linear) while cross-copy texts remain
near-dups — the honest 10x stress for the MinHash/SimHash family.
n_chars is kept consistent with the suffixed text. Everything is
deterministic: no randomness, byte-stable reruns.

Usage: gen_sf.py SRC_DIR DST_DIR [M]
"""
import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC, DST = sys.argv[1], sys.argv[2]
M = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)

# per-table key columns and their cardinality-offset sources
CARD = {}


def card(table):
    if table not in CARD:
        CARD[table] = pq.read_metadata(f"{SRC}/{table}.parquet").num_rows
    return CARD[table]


def scale(table, mutate):
    """Read SRC table, emit M key-shifted copies via `mutate(df, k)`,
    write DST preserving the original arrow schema (incl. int32 cols
    and timestamp[ns]).

    Copies STREAM through one ParquetWriter (round 11): the previous
    concat-all-M-copies form held M+2 table images in pandas at once,
    which is fine at M=3 from sf10 but blows past this box's RAM at
    the sf100 rung (M=10 from sf10, ~60 M-row lineitem copies). Peak
    memory is now ~2 table images regardless of M; rows and their
    order are identical to the concat form."""
    orig = pq.read_table(f"{SRC}/{table}.parquet")
    df = orig.to_pandas()
    total = orig.num_rows * M
    # Row-group layout matters as much as row count for a scale stress:
    # pyarrow's default left sf3 documents as ONE row group, and Spark
    # cannot split a parquet scan below row-group granularity — the
    # whole doc-kernel family ran single-task. A real corpus at this
    # scale is many files/groups; emit >=64 groups per table so scans
    # parallelize like production data.
    rg = max(1000, total // 64)
    with pq.ParquetWriter(f"{DST}/{table}.parquet", orig.schema) as w:
        for k in range(M):
            c = df.copy()
            mutate(c, k)
            w.write_table(
                pa.Table.from_pandas(c, schema=orig.schema, preserve_index=False),
                row_group_size=rg)
    print(f"{table}: {orig.num_rows} -> {total}")


def copy_fixed(table):
    pq.write_table(pq.read_table(f"{SRC}/{table}.parquet"),
                   f"{DST}/{table}.parquet")
    print(f"{table}: fixed dim, copied as-is")


copy_fixed("region")
copy_fixed("nation")

nCust, nSupp, nPart = card("customer"), card("supplier"), card("part")
nOrd, nEvt = card("orders"), card("events")
nDoc, nVec = card("documents"), card("embeddings")


def mut_customer(c, k):
    c["c_custkey"] += k * nCust
    c["c_name"] = c["c_custkey"].map(lambda i: f"Customer#{i:09d}")


def mut_supplier(c, k):
    c["s_suppkey"] += k * nSupp
    c["s_name"] = c["s_suppkey"].map(lambda i: f"Supplier#{i:09d}")


def mut_part(c, k):
    c["p_partkey"] += k * nPart


def mut_orders(c, k):
    c["o_orderkey"] += k * nOrd
    c["o_custkey"] += k * nCust


def mut_lineitem(c, k):
    c["l_orderkey"] += k * nOrd
    c["l_partkey"] += k * nPart
    c["l_suppkey"] += k * nSupp


def mut_events(c, k):
    c["event_id"] += k * nEvt
    c["user_id"] += k * nCust  # stays inside copy-k's customer range


def mut_documents(c, k):
    c["doc_id"] += k * nDoc
    if k > 0:
        suffix = f" c{k}"
        c["text"] = c["text"] + suffix
        c["n_chars"] = c["n_chars"] + len(suffix)


def mut_embeddings(c, k):
    c["vec_id"] += k * nVec
    if k > 0:
        # ADVICE r7: copies used to keep vectors byte-identical, making
        # the scaled embedding space M exact overlays of the source
        # cloud (every vector gained M-1 cosine-1.0 twins — a partly
        # degenerate stress for IVF/semdedup/near-dup). Mirror what
        # mut_documents does for text: a tiny deterministic per-copy
        # nudge on one k-dependent coordinate, so cross-copy vectors
        # are NEAR-duplicates (cosine ~0.9996..0.999996 for k=1..9 on
        # unit vectors) rather than exact ones. No randomness.
        import numpy as np
        delta = np.float32(0.003 * k)

        def nudge(v):
            a = np.asarray(v, dtype=np.float32).copy()
            a[(k * 7) % len(a)] += delta
            return a

        c["embedding"] = c["embedding"].map(nudge)


scale("customer", mut_customer)
scale("supplier", mut_supplier)
scale("part", mut_part)
scale("orders", mut_orders)
scale("lineitem", mut_lineitem)
scale("events", mut_events)
scale("documents", mut_documents)
scale("embeddings", mut_embeddings)
print(f"done: {DST} at {M}x {SRC}")
