#!/usr/bin/env python3
"""Derive a larger scale factor from the driver-generated testdata by
deterministic key-offset replication (no randomness, no external data):

  python3 tools/make_sf.py /root/testdata/sf0.1 /tmp/sf1 10

Each replica r offsets every key column by r * (max_key + 1), so join
integrity (orders<->lineitem<->part/supplier, customer, events users,
documents, embeddings) is preserved and id spaces stay contiguous-ish,
matching the driver's own sf0.01 -> sf0.1 shape. region/nation are fixed
dimensions at every TPC-H scale factor and are copied as-is.

Replica > 0 documents get a one-token `rep<r>` prefix: exact-identical
10x copies would make every doc a 10-clone cluster (legal, but a
degenerate dedup workload); the prefix keeps them distinct documents
with realistic cross-replica near-duplicate structure instead.
"""
import sys

import duckdb


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    con = duckdb.connect()
    con.sql("SET threads TO 8")
    import os
    os.makedirs(dst, exist_ok=True)

    def t(name: str) -> str:
        return f"read_parquet('{src}/{name}.parquet')"

    def write(name: str, sql: str) -> None:
        con.sql(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{name}.parquet')").fetchone()[0]
        print(f"{name}: {n} rows")

    # fixed dimensions
    for d in ("region", "nation"):
        write(d, f"SELECT * FROM {t(d)}")

    offs = {}
    for table, key in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                       ("part", "p_partkey"), ("orders", "o_orderkey"),
                       ("events", "event_id"), ("documents", "doc_id"),
                       ("embeddings", "vec_id")]:
        offs[table] = con.sql(
            f"SELECT max({key}) + 1 FROM {t(table)}").fetchone()[0]
    offs["user"] = con.sql(
        f"SELECT max(user_id) + 1 FROM {t('events')}").fetchone()[0]

    r = f"range({factor}) reps(r)"
    write("customer", f"""
        SELECT c_custkey + r * {offs['customer']} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {t('customer')}, {r}""")
    write("supplier", f"""
        SELECT s_suppkey + r * {offs['supplier']} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM {t('supplier')}, {r}""")
    write("part", f"""
        SELECT p_partkey + r * {offs['part']} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM {t('part')}, {r}""")
    write("orders", f"""
        SELECT o_orderkey + r * {offs['orders']} AS o_orderkey,
               o_custkey + r * {offs['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t('orders')}, {r}""")
    write("lineitem", f"""
        SELECT l_orderkey + r * {offs['orders']} AS l_orderkey,
               l_partkey + r * {offs['part']} AS l_partkey,
               l_suppkey + r * {offs['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM {t('lineitem')}, {r}""")
    write("events", f"""
        SELECT event_id + r * {offs['events']} AS event_id, ts,
               user_id + r * {offs['user']} AS user_id,
               event_type, value, props
        FROM {t('events')}, {r}""")
    write("documents", f"""
        SELECT doc_id + r * {offs['documents']} AS doc_id,
               CASE WHEN r = 0 THEN text ELSE 'rep' || r::VARCHAR || ' ' || text END AS text,
               lang, source,
               n_chars + CASE WHEN r = 0 THEN 0 ELSE length('rep' || r::VARCHAR || ' ') END AS n_chars
        FROM {t('documents')}, {r}""")
    write("embeddings", f"""
        SELECT vec_id + r * {offs['embeddings']} AS vec_id, embedding, label
        FROM {t('embeddings')}, {r}""")


if __name__ == "__main__":
    main()
