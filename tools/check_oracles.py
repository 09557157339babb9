#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Reads /tmp/verify/<name>/ parquet (Spark results) + oracle_sql.json, runs
each oracle in DuckDB over the sf dir's parquet tables, and compares:
  - row count
  - schema (column names, sorted)
  - value hash (columns sorted by name, rows sorted, values stringified)
"""
import sys, json, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify with float normalization
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return rows

fails = []
for name, sql in sorted(oracles.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"{name:28s} NO-SPARK-OUTPUT"); fails.append(name); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files])
    try:
        duck_df = con.sql(sql).df()
    except Exception as e:
        print(f"{name:28s} ORACLE-ERROR {str(e)[:90]}"); fails.append(name); continue
    s_rows, d_rows = canon(spark_df), canon(duck_df)
    schema_ok = sorted(spark_df.columns) == sorted(duck_df.columns)
    n_ok = len(s_rows) == len(d_rows)
    val_ok = s_rows == d_rows
    if schema_ok and n_ok and val_ok:
        print(f"{name:28s} OK    rows={len(s_rows)}")
    else:
        fails.append(name)
        print(f"{name:28s} FAIL  schema={schema_ok} rows={len(s_rows)}/{len(d_rows)} values={val_ok}")
        if schema_ok and n_ok:
            diff = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
            for a, b in diff:
                print(f"    spark: {a}\n    duck : {b}")
        elif not schema_ok:
            print(f"    spark cols: {sorted(spark_df.columns)}\n    duck cols : {sorted(duck_df.columns)}")

# rows-only queries (no oracle)
import os
for d in sorted(os.listdir(out_dir)):
    if d != "oracle_sql.json" and d not in oracles:
        files = glob.glob(f"{out_dir}/{d}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"{d:28s} ROWS-ONLY rows={n}" + ("  (EMPTY!)" if n == 0 else ""))

print(f"\n{len(oracles)-len(fails)}/{len(oracles)} oracle queries pass")
sys.exit(1 if fails else 0)
