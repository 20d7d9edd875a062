#!/usr/bin/env python3
"""Build the 10x scale-rehearsal dataset (SCALE.md "Measured at sf1").

Replicates the sf0.1 fact tables 10x with shifted keys into target/sf1:
  - lineitem/orders: orderkey += replica * 1e9 (join keys stay valid)
  - customer: custkey += replica * 1e8, c_name REWRITTEN to the shifted key
    so name-prefix blocking keeps its block-size distribution (identical
    names would grow blocks 10x and square the fuzzy-join work — that is a
    different experiment, not a scale-up)
  - events: event_id += replica * 1e12, user_id += replica * 1e7 (10x users,
    per-user volume unchanged — windows see the same key sizes); ts written
    as TIMESTAMP_NS so the parquet logical type matches the source file —
    Spark reads it as int64 nanos (nanosAsLong), DuckDB as a timestamp, the
    same split the original relies on (written via pyarrow — DuckDB's COPY
    always emits timestamp[us])
  - documents: doc_id += replica * 1e5, text unchanged (10 exact copies per
    text -> dedup operators see 10x denser duplicate structure, the
    adversarial direction). The shift must keep ids below the 1e6 planted-
    twin offset (q30/q40) and the 9e6 planted-fixture base (q133), and keep
    doc_id % 1e6 collision-free across replicas (q40's twin-pairing key) —
    1e5 > max base id 5e4 satisfies all three
Dimensions (nation/region/part/supplier) and embeddings are copied as-is.

Usage: python3 tools/make_sf1.py   (driver-side tooling; duckdb required)
"""
import duckdb, shutil, os
import pyarrow as pa
import pyarrow.parquet as pq

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

    "documents": f"""SELECT doc_id + r.i * 100000 AS doc_id, text, lang, source, n_chars
        FROM '{SRC}/documents.parquet', range({R}) r(i)""",
}
for t, q in specs.items():
    con.sql(f"COPY ({q}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0])
# events: the source stores ts as timestamp[us] (isAdjustedToUTC=false),
# same as DuckDB's COPY output — no pyarrow cast needed anymore
# (Tables.events passes µs timestamps through; the ns shim only fires on
# legacy TIMESTAMP(NANOS) files)
specs_ev = f"""SELECT event_id + r.i * 1000000000000 AS event_id, ts,
        user_id + r.i * 10000000 AS user_id, event_type, value, props
        FROM '{SRC}/events.parquet', range({R}) r(i)"""
con.sql(f"COPY ({specs_ev}) TO '{DST}/events.parquet' (FORMAT PARQUET)")
print("events", con.sql(f"SELECT count(*) FROM '{DST}/events.parquet'").fetchone()[0])

for t in ["nation", "region", "part", "supplier", "embeddings"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
print("done ->", DST)
