#!/usr/bin/env python3
"""Synthetic production-width embedding fixture (r12 verdict #8).

The sf100 sampled-training A/B (8.93 -> 6.68 s) ran on this corpus's
compute-light 64-dim vectors; the claim that sampling decides build
time is an IO argument, so it needs a rung at production row width.
This writes <dst>/embeddings.parquet with N rows of DIM-dim float
vectors (~DIM*4 bytes/row payload; 768 -> ~3 KB, the typical
sentence-embedding width), deterministic (no RNG state dependence:
vector entries are a hash-ish of (vec_id, dim) -- byte-stable reruns).

Only the embeddings table is written: the train-ab harness
(Scratch "train-ab") touches nothing else.

Usage: gen_wide_vecs.py DST_DIR [N] [DIM]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DST = sys.argv[1]
N = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
DIM = int(sys.argv[3]) if len(sys.argv) > 3 else 768

os.makedirs(DST, exist_ok=True)

CHUNK = 20_000
# schema built upfront so the writer exists even for N=0, and writes
# run under try/finally: a mid-loop failure must not leave a
# truncated embeddings.parquet that a later run treats as a valid
# fixture -- the partial file is removed on any error
SCHEMA = pa.schema([
    ("vec_id", pa.int64()),
    ("embedding", pa.list_(pa.float32())),
    ("label", pa.int32())])
PATH = f"{DST}/embeddings.parquet"
writer = pq.ParquetWriter(PATH, SCHEMA)
try:
    for lo in range(0, N, CHUNK):
        hi = min(N, lo + CHUNK)
        ids = np.arange(lo, hi, dtype=np.int64)
        # deterministic pseudo-random entries: sin of a per-(id,dim)
        # LCG mix -- cheap, seedless, byte-stable across numpy versions
        grid = ids[:, None] * np.int64(2654435761) + np.arange(DIM)[None, :] * np.int64(40503)
        vecs = np.sin(grid.astype(np.float64) * 1e-4).astype(np.float32)
        flat = pa.array(vecs.reshape(-1), type=pa.float32())
        arr = pa.FixedSizeListArray.from_arrays(flat, DIM).cast(pa.list_(pa.float32()))
        batch = pa.table(
            {"vec_id": pa.array(ids), "embedding": arr,
             "label": pa.array((ids % 7).astype(np.int32))},
            schema=SCHEMA)
        writer.write_table(batch)
except BaseException:
    writer.close()
    os.remove(PATH)
    raise
writer.close()
print(f"wrote {PATH} n={N} dim={DIM}")
