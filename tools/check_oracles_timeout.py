#!/usr/bin/env python3
"""check_oracles.py variant for large scale factors: each oracle replay
runs in its own subprocess with a wall timeout, so one quadratic DuckDB
replay cannot stall the whole gate — it gets reported as TIMEOUT with
its elapsed time instead (the documented-exclusion path for scale-up
evidence). Same comparison semantics as check_oracles.py. Usage:

  python3 tools/check_oracles_timeout.py <sfDir> <outDir> [timeoutSec] [only,only2]
"""
import glob
import json
import multiprocessing as mp
import os
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)

    return sorted(tuple(cell(v) for v in row)
                  for row in df.itertuples(index=False))


def run_one(sf_dir, out_dir, name, sql, q):
    import duckdb
    import pandas as pd
    try:
        con = duckdb.connect()
        con.sql("SET threads TO 8")
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            q.put(("NO-SPARK-OUTPUT", "")); return
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        duck_df = con.sql(sql).df()
        s_rows, d_rows = canon(spark_df), canon(duck_df)
        schema_ok = sorted(spark_df.columns) == sorted(duck_df.columns)
        if schema_ok and s_rows == d_rows:
            q.put(("OK", f"rows={len(s_rows)}"))
        else:
            detail = (f"schema={schema_ok} rows={len(s_rows)}/{len(d_rows)} "
                      f"values={s_rows == d_rows}")
            q.put(("FAIL", detail))
    except Exception as e:  # noqa: BLE001
        q.put(("ORACLE-ERROR", str(e)[:120]))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails, timeouts = [], []
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(sf_dir, out_dir, name, sql, q))
        t0 = time.time()
        p.start()
        p.join(timeout)
        el = time.time() - t0
        if p.is_alive():
            p.terminate()
            p.join()
            timeouts.append(name)
            print(f"{name:28s} TIMEOUT >{timeout}s", flush=True)
            continue
        status, detail = q.get() if not q.empty() else ("CRASH", "")
        if status != "OK":
            fails.append(name)
        print(f"{name:28s} {status:6s} {detail}  ({el:.1f}s)", flush=True)
    total = len(only) if only else len(oracles)
    print(f"\n{total - len(fails) - len(timeouts)}/{total} pass, "
          f"{len(timeouts)} timeout: {sorted(timeouts)}", flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
