#!/usr/bin/env python3
"""Scale ONLY the embeddings table by M — the vector-family rung
generator for A/Bs that touch nothing else (the hier-quantizer and
train-width measurements). Identical semantics to gen_sf.py's
mut_embeddings (key shift + the deterministic per-copy near-dup
nudge), so a vec-only dir at M is byte-identical to the embeddings
table a full gen_sf.py run at M would produce.

Usage: gen_sf_embeddings.py SRC_DIR DST_DIR M
"""
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC, DST = sys.argv[1], sys.argv[2]
M = int(sys.argv[3])
os.makedirs(DST, exist_ok=True)

orig = pq.read_table(f"{SRC}/embeddings.parquet")
df = orig.to_pandas()
nVec = orig.num_rows
total = nVec * M
rg = max(1000, total // 64)

with pq.ParquetWriter(f"{DST}/embeddings.parquet", orig.schema) as w:
    for k in range(M):
        c = df.copy()
        c["vec_id"] += k * nVec
        if k > 0:
            delta = np.float32(0.003 * k)

            def nudge(v, k=k, delta=delta):
                a = np.asarray(v, dtype=np.float32).copy()
                a[(k * 7) % len(a)] += delta
                return a

            c["embedding"] = c["embedding"].map(nudge)
        w.write_table(
            pa.Table.from_pandas(c, schema=orig.schema, preserve_index=False),
            row_group_size=rg)
print(f"embeddings: {nVec} -> {total} at {DST}")
