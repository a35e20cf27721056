#!/usr/bin/env python3
"""Local dev harness: replicate the driver's correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB over the same testdata, compares sorted rows/columns.

Usage: python3 tools/check.py [verify_out_dir] [sf_dir]
(run graft.Verify first: sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout")
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd

vout = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{vout}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cmp(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return f"COLUMN MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    return f"VALUE MISMATCH col={c} row={i}: spark={x!r} duck={y!r} (diff={abs(x-y)})"
            elif str(x) != str(y):
                return f"VALUE MISMATCH col={c} row={i}: spark={x!r} duck={y!r}"
    return None

fails = 0
for name in sorted(oracle):
    res_dir = f"{vout}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"[FAIL] {name}: no spark result at {res_dir}")
        fails += 1
        continue
    spark_df = norm(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
    try:
        duck_df = norm(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"[FAIL] {name}: oracle error: {e}")
        fails += 1
        continue
    err = cmp(spark_df, duck_df)
    if err:
        print(f"[FAIL] {name}: {err}")
        fails += 1
    else:
        print(f"[ ok ] {name} ({len(spark_df)} rows, {len(spark_df.columns)} cols)")

# queries without oracle = weaker rows-only check
for d in sorted(glob.glob(f"{vout}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name not in oracle:
        n = sum(len(pd.read_parquet(f)) for f in glob.glob(f"{d}/*.parquet"))
        print(f"[rows] {name}: {n} rows (no oracle)")

print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
