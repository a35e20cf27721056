#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: oracle_check.py <verify_out_dir> <sf_dir>
For each query dir in verify_out: read Spark parquet result, run the oracle
SQL in DuckDB over the sf parquet tables, sort columns by name, sort rows,
round doubles, hash-compare.
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                str(type(v)).endswith("ndarray'>") else v)
        try:
            if str(df[c].dtype).startswith("float"):
                df[c] = df[c].round(6)
        except Exception:
            pass
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest(), len(df)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(qdir)
        spark_df = pd.concat([pd.read_parquet(f) for f in
                              glob.glob(os.path.join(qdir, "*.parquet"))],
                             ignore_index=True)
        if name not in oracles:
            ok = len(spark_df) > 0
            n_rowsonly += 1
            print(f"{'ROWS-OK' if ok else 'ROWS-EMPTY':9s} {name} rows={len(spark_df)} (no oracle)")
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{'ORACLE-ERR':9s} {name}: {e}")
            n_fail += 1
            continue
        (h1, r1), (h2, r2) = canon(spark_df), canon(duck_df)
        if h1 == h2:
            n_pass += 1
            print(f"{'PASS':9s} {name} rows={r1}")
        else:
            n_fail += 1
            print(f"{'FAIL':9s} {name} spark_rows={r1} duck_rows={r2}")
            if r1 == r2 and r1 > 0:
                sd = spark_df.reindex(sorted(spark_df.columns), axis=1).sort_values(by=sorted(spark_df.columns)).reset_index(drop=True)
                dd = duck_df.reindex(sorted(duck_df.columns), axis=1).sort_values(by=sorted(duck_df.columns)).reset_index(drop=True)
                print(f"          spark cols={list(sd.columns)} duck cols={list(dd.columns)}")
                print("          spark head:", sd.head(2).to_dict("records"))
                print("          duck  head:", dd.head(2).to_dict("records"))
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")

if __name__ == "__main__":
    main()
