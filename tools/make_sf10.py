#!/usr/bin/env python3
"""Build the 100x scale-rehearsal dataset (SCALE.md "Measured at sf10").

Same key-shift pattern as make_sf1.py but 100 replicas of sf0.1 into
target/sf10 (~1.4 GB). This is a TARGETED rehearsal set for the heavy
families (round-12 verdict item 1: q98/q194 fuzzy linkage, q401 NB build,
q192 per-row AES, q235/q240/q314 index builds, q118 packing prefix sum) —
NOT a full-catalog replica:

  - the planted-twin invariants (q30/q40/q133 rely on doc_id < 1e6 offsets
    and doc_id % 1e6 uniqueness) are NOT preserved at 100 replicas
    (doc_id += r*1e5 reaches 9.95e6 and collides mod 1e6 across r, r+10) —
    do not run the planted-fixture queries against sf10;
  - embeddings ARE replicated here (make_sf1 copies them as-is): vec_id
    += r*1e4 and the vector is ROTATED by r%64 dimensions — norms and
    within-replica geometry are preserved exactly while replicas point in
    different directions, so the IVF/kNN builds see a genuinely 100x
    corpus, not 100 coincident copies (which would measure the degenerate
    all-duplicates regime, a different experiment).

customer c_name is rewritten to the shifted key (the make_sf1 argument:
identical names would grow q98's blocks 100x and square the fuzzy-join
work — that is a skew experiment, not a scale-up; SkewBench owns that).

Usage: python3 tools/make_sf10.py   (driver-side tooling; duckdb required)
"""
import duckdb, shutil, os

SRC = "/root/testdata/sf0.1"
DST = "target/sf10"
R = 100

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
    # r*1e7, NOT make_sf1's r*1e8: at 100 replicas an 1e8 shift makes
    # 10-digit keys, and lpad(...,9) TRUNCATES them — colliding names grow
    # q98/q194's prefix-16 blocks 10x and square the fuzzy-join work (a skew
    # experiment, not a scale-up). 1e7 keeps every key 9-digit (max
    # 99e7+15000 < 1e9), names unique, and the block-size law identical to
    # sf0.1/sf1 (last two digits free inside a prefix block).
    "customer": f"""SELECT c_custkey + r.i * 10000000 AS c_custkey,
        'Customer#' || lpad(CAST(c_custkey + r.i * 10000000 AS VARCHAR), 9, '0') AS c_name,
        c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', range({R}) r(i)""",
    "documents": f"""SELECT doc_id + r.i * 100000 AS doc_id, text, lang, source, n_chars
        FROM '{SRC}/documents.parquet', range({R}) r(i)""",
    "events": f"""SELECT event_id + r.i * 1000000000000 AS event_id, ts,
        user_id + r.i * 10000000 AS user_id, event_type, value, props
        FROM '{SRC}/events.parquet', range({R}) r(i)""",
    "embeddings": f"""SELECT vec_id + r.i * 10000 AS vec_id,
        CAST(list_concat(embedding[(r.i % 64) + 1:],
          CASE WHEN r.i % 64 = 0 THEN []::FLOAT[]
               ELSE embedding[1:(r.i % 64)] END) AS FLOAT[]) AS embedding,
        label
        FROM '{SRC}/embeddings.parquet', range({R}) r(i)""",
}
for t, q in specs.items():
    con.sql(f"COPY ({q}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0])

for t in ["nation", "region", "part", "supplier"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
print("done ->", DST)
