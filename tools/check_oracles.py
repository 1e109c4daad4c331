#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (builder-side tool only).

Reads the Verify.scala output directory (one parquet dir per query +
oracle_sql.json), registers the sf parquet tables in DuckDB, runs each
oracle, and compares: row count, column names, and a hash of the
row-set with columns sorted by name (order-insensitive).

IMPORTANT: both sides are fetched THROUGH PANDAS (`rel.df()`), exactly
like the driver's gate. fetchall() would deliver DuckDB HUGEINT as a
Python int that compares equal to Spark's int64 — hiding the
HUGEINT→float64 typing failures the driver's pandas compare catches
(this produced round 1's false local 44/44). Through pandas, a bare
SUM(BIGINT) oracle lands as float64 (`3.0`) and correctly mismatches
Spark's int64 (`3`). Array columns raise, as they do in the driver.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir> [query ...]
Optional trailing query names restrict the check to those queries
(resume after a crash, or re-verify one oracle after an edit).
"""
import sys, os, json, glob, math, atexit, shutil
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # dtype-sensitive on purpose: float64 3.0 must NOT equal int64 3
    if isinstance(v, (np.ndarray, list, tuple)):
        raise TypeError(f"array cell (driver's pandas sort cannot hash these): {type(v)}")
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
        return repr(int(v))
    return repr(v)


def canon(df):
    cols = sorted(df.columns)
    rows = df[cols].itertuples(index=False, name=None)
    return sorted("|".join(norm_cell(c) for c in r) for r in rows)


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    # bound DuckDB so a heavy oracle (sf1 near-dup joins) spills to
    # disk instead of OOM-killing the gate at the box's 128 GB;
    # GRAFT_DUCK_MEM overrides for single heavy oracles (the sf1 IVF
    # replay needs ~2.5x the default)
    con.sql(f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '40GB')}'")
    # per-process spill dir: two concurrent checkers sharing one
    # temp_directory corrupt each other's spill files (observed as
    # SIGSEGV / torn-read IO errors during the r9 sf3 parallel run).
    # Cleaned up in the finally below — gate scripts must NOT glob-rm
    # /tmp/duck_spill_* between chunks: during the r14 sf3 run that
    # glob deleted a CONCURRENT checker's live spill dir mid-query
    # ("Cannot open duckdb_temp_storage-0.tmp").
    # Only auto-delete a spill dir THIS process created (the per-pid
    # default). An operator-supplied GRAFT_DUCK_TMP may be a shared or
    # pre-existing scratch dir — rmtree'ing it at exit would destroy a
    # concurrent checker's live spill (the exact "Cannot open
    # duckdb_temp_storage-*.tmp" incident) or unrelated contents; the
    # operator owns its lifecycle.
    if "GRAFT_DUCK_TMP" in os.environ:
        spill = os.environ["GRAFT_DUCK_TMP"]
    else:
        spill = f"/tmp/duck_spill_{os.getpid()}"
        atexit.register(shutil.rmtree, spill, True)
        # Reclaim spill dirs leaked by SIGKILL/OOM-killed checkers
        # (atexit never ran): per-pid dirs whose pid is no longer
        # alive. Feeds-ENOSPC fix — nothing else reclaims these.
        for stale in glob.glob("/tmp/duck_spill_*"):
            try:
                pid = int(stale.rsplit("_", 1)[1])
                os.kill(pid, 0)  # raises if pid is dead
            except ValueError:
                continue
            except ProcessLookupError:
                shutil.rmtree(stale, ignore_errors=True)
            except PermissionError:
                pass  # pid alive under another uid — leave it
    con.sql(f"SET temp_directory='{spill}'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    n_pass = n_fail = 0
    # driver-format record per query (CORRECTNESS_r*.json shape), dumped
    # to $GRAFT_JSON_OUT so scale-audit runs produce a single artifact
    report = {}

    def rec(rows_m, schema_m, hash_m, s_rows, o_rows, err):
        return {"rows_match": rows_m, "schema_match": schema_m,
                "hash_match": hash_m, "spark_rows": s_rows,
                "oracle_rows": o_rows, "err": err}

    for name, sql in sorted(oracles.items()):
        qdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result at {qdir}")
            report[name] = rec(False, False, False, 0, None, "no spark result")
            n_fail += 1
            continue
        try:
            s_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            report[name] = rec(False, False, False, None, None,
                               f"oracle error: {e}"[:300])
            n_fail += 1
            continue
        schema_ok = sorted(s_df.columns) == sorted(duck_df.columns)
        rows_ok = len(s_df) == len(duck_df)
        msgs = []
        if not schema_ok:
            msgs.append(f"cols spark={sorted(s_df.columns)} duck={sorted(duck_df.columns)}")
        if not rows_ok:
            msgs.append(f"rows spark={len(s_df)} duck={len(duck_df)}")
        hash_ok = False
        if schema_ok and rows_ok:
            try:
                cs, cd = canon(s_df), canon(duck_df)
            except TypeError as e:
                print(f"FAIL {name}: harness-equivalent error: {e}")
                report[name] = rec(rows_ok, schema_ok, False, len(s_df),
                                   len(duck_df), f"hash error: {e}"[:300])
                n_fail += 1
                continue
            hash_ok = cs == cd
            if not hash_ok:
                diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                msgs.append(f"values differ, first diffs: {diff}")
        report[name] = rec(rows_ok, schema_ok, hash_ok, len(s_df),
                           len(duck_df), None if not msgs else "; ".join(msgs)[:300])
        if schema_ok and rows_ok and hash_ok:
            print(f"PASS {name} ({len(s_df)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: " + "; ".join(msgs))
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    json_out = os.environ.get("GRAFT_JSON_OUT")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(report)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3:]) or None))
