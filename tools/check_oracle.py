#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <verify_out_dir> <sf_dir>
Loads each <name>/ parquet result (Spark output) and runs the matching
oracle SQL in DuckDB over the sf_dir tables; compares sorted rows.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)

n_pass = n_fail = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    parts = glob.glob(f"{d}/*.parquet")
    if not parts:
        print(f"{name:28s} NO-OUTPUT (query failed in Verify)")
        n_fail += 1
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in parts], ignore_index=True)
    if name not in oracle:
        print(f"{name:28s} ROWS-ONLY rows={len(spark_df)}")
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE-SQL-ERROR {e}")
        n_fail += 1
        continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"{name:28s} COL-MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
        n_fail += 1
        continue
    if len(a) != len(b):
        print(f"{name:28s} ROWCOUNT spark={len(a)} duck={len(b)}")
        n_fail += 1
        continue
    if a.equals(b):
        print(f"{name:28s} OK rows={len(a)}")
        n_pass += 1
    else:
        neq = (a != b) & ~(a.isna() & b.isna())
        bad_cols = [c for c in a.columns if neq[c].any()]
        print(f"{name:28s} VALUE-MISMATCH cols={bad_cols}")
        for c in bad_cols[:2]:
            i = neq[c].idxmax()
            print(f"    {c}[{i}]: spark={a[c][i]!r} duck={b[c][i]!r}")
        n_fail += 1
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
