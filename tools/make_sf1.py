#!/usr/bin/env python3
"""Build the 10x scale-rehearsal dataset (SCALE.md "Measured at sf1").

Replicates the sf0.1 fact tables 10x with shifted keys into target/sf1:
  - lineitem/orders: orderkey += replica * 1e9 (join keys stay valid)
  - customer: custkey += replica * 1e8, c_name REWRITTEN to the shifted key
    so name-prefix blocking keeps its block-size distribution (identical
    names would grow blocks 10x and square the fuzzy-join work — that is a
    different experiment, not a scale-up)
  - events: event_id += replica * 1e12, user_id += replica * 1e7 (10x users,
    per-user volume unchanged — windows see the same key sizes); ts kept as
    int64 NANOS (epoch_ns) because graft.sources.Tables.events expects the
    raw nanos column
  - documents: doc_id += replica * 1e7, text unchanged (10 exact copies per
    text -> dedup operators see 10x denser duplicate structure, the
    adversarial direction)
Dimensions (nation/region/part/supplier) and embeddings are copied as-is.

Usage: python3 tools/make_sf1.py   (driver-side tooling; duckdb required)
"""
import duckdb, shutil, os

SRC = "/root/testdata/sf0.1"
DST = "target/sf1"
R = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
specs = {
    "lineitem": f"""SELECT l_orderkey + r.i * 1000000000 AS l_orderkey,
        l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', range({R}) r(i)""",
    "orders": f"""SELECT o_orderkey + r.i * 1000000000 AS o_orderkey, o_custkey,
        o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', range({R}) r(i)""",
    "customer": f"""SELECT c_custkey + r.i * 100000000 AS c_custkey,
        'Customer#' || lpad(CAST(c_custkey + r.i * 100000000 AS VARCHAR), 9, '0') AS c_name,
        c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', range({R}) r(i)""",
    "events": f"""SELECT event_id + r.i * 1000000000000 AS event_id,
        CAST(epoch_ns(ts) AS BIGINT) AS ts,
        user_id + r.i * 10000000 AS user_id, event_type, value, props
        FROM '{SRC}/events.parquet', range({R}) r(i)""",
    "documents": f"""SELECT doc_id + r.i * 10000000 AS doc_id, text, lang, source, n_chars
        FROM '{SRC}/documents.parquet', range({R}) r(i)""",
}
for t, q in specs.items():
    con.sql(f"COPY ({q}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0])
for t in ["nation", "region", "part", "supplier", "embeddings"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
print("done ->", DST)
