#!/usr/bin/env python3
"""Staged sf10 certificate for q300 (bitext margin mining).

q300's one-statement oracle re-runs the Lloyd training prelude inline and
hits DuckDB's memory ceiling at 200k vectors (round-15's named exception).
This replay splits the certificate at the ARTIFACT boundary instead:

  - training + assignment are already sf10-certified by q235's own oracle
    (per-list member-id checksums + pinned centroid coordinates,
    value-exact at sf10);
  - this script takes the engine's trained centroid VALUES (exported
    parquet) and replays everything downstream of training from raw
    embeddings — multi-probe assignment, probe-cell candidate
    intersection, exact integer dots, margin top-10 — stage by stage,
    each a bounded DuckDB statement materialized to a temp table.

Exactness: dots use list_inner_product over the u-int (x*1e6 rounded)
BIGINT lists; every per-dim product is <= ~1e12 and the 64-term sum
<= ~6.4e13, far inside double's 2^53 exact-integer range, so the DOUBLE
return is integer-exact and cast back to BIGINT.

Method validation: run at sf1 FIRST (`--sf1`) and require the staged
result to equal the engine's sf1 output, which the one-statement oracle
already certifies — that pins the staged method itself before it is
trusted at sf10.

Usage: q300_staged_cert.py <sfDir> <centroids.parquet> <engine_dump_dir>
"""
import duckdb, glob, sys

sf_dir, cent_path, dump_dir = sys.argv[1], sys.argv[2], sys.argv[3]
K_MARGIN, PROBES = 4, 3  # Q300MarginK, Q300Probes (Similarity.scala)

con = duckdb.connect()
con.sql("PRAGMA threads=32")
con.sql("PRAGMA memory_limit='60GB'")
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'")
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
con.sql(f"CREATE VIEW cent AS SELECT cid, ce FROM '{cent_path}/*.parquet'")

# stage 1: per-vector double + u-int lists for the en/de population
con.sql("""
CREATE TEMP TABLE lv AS
SELECT e.vec_id, d.lang,
       list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS ed,
       list_transform(e.embedding,
         x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xq
FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
WHERE d.lang IN ('en', 'de')""")
n = con.sql("SELECT count(*), count_if(lang='en'), count_if(lang='de') FROM lv").fetchone()
print(f"[stage1] en/de vectors: {n[0]} (en {n[1]}, de {n[2]})")

# stage 2: multi-probe assignment against the EXPORTED trained centroids
con.sql(f"""
CREATE TEMP TABLE probes AS
SELECT vec_id, cid, lang FROM (
  SELECT l.vec_id, c.cid, l.lang,
         list_dot_product(l.ed, c.ce) /
           (sqrt(list_dot_product(l.ed, l.ed)) *
            sqrt(list_dot_product(c.ce, c.ce))) AS sim,
         row_number() OVER (PARTITION BY l.vec_id
                            ORDER BY sim DESC, c.cid ASC) AS rn
  FROM lv l CROSS JOIN cent c)
WHERE rn <= {PROBES}""")
print(f"[stage2] probe rows: {con.sql('SELECT count(*) FROM probes').fetchone()[0]}")

# stage 3: candidate pairs = en x de probe-cell intersection
con.sql("""
CREATE TEMP TABLE cand AS
SELECT DISTINCT pa.vec_id AS va, pb.vec_id AS vb
FROM probes pa JOIN probes pb ON pa.cid = pb.cid
WHERE pa.lang = 'en' AND pb.lang = 'de'""")
n_cand = con.sql("SELECT count(*) FROM cand").fetchone()[0]
print(f"[stage3] candidate pairs: {n_cand}")

# stage 4: exact integer dots over the u-int lists
con.sql("""
CREATE TEMP TABLE dots AS
SELECT c.va, c.vb,
       CAST(list_inner_product(a.xq, b.xq) AS BIGINT) AS dot
FROM cand c JOIN lv a ON a.vec_id = c.va JOIN lv b ON b.vec_id = c.vb""")
print(f"[stage4] dots: {con.sql('SELECT count(*) FROM dots').fetchone()[0]}")

# stage 5: per-side top-k neighborhood sums + margin top-10
staged = con.sql(f"""
WITH sa AS (SELECT va, CAST(sum(dot) AS BIGINT) AS sum_a FROM (
              SELECT va, dot, row_number() OVER (PARTITION BY va
                ORDER BY dot DESC, vb ASC) AS rn FROM dots)
            WHERE rn <= {K_MARGIN} GROUP BY va),
     sb AS (SELECT vb, CAST(sum(dot) AS BIGINT) AS sum_b FROM (
              SELECT vb, dot, row_number() OVER (PARTITION BY vb
                ORDER BY dot DESC, va ASC) AS rn FROM dots)
            WHERE rn <= {K_MARGIN} GROUP BY vb)
SELECT d.va AS doc_en, d.vb AS doc_de, d.dot,
       CAST(2 * {K_MARGIN} * d.dot - sa.sum_a - sb.sum_b AS BIGINT) AS margin
FROM dots d JOIN sa ON sa.va = d.va JOIN sb ON sb.vb = d.vb
ORDER BY margin DESC, d.va ASC, d.vb ASC LIMIT 10""").fetchall()

files = sorted(glob.glob(f"{dump_dir}/q300_bitext_margin/*.parquet"))
flist = "[" + ", ".join(f"'{f}'" for f in files) + "]"
engine = con.sql(
    f"SELECT doc_en, doc_de, dot, margin FROM read_parquet({flist}) "
    "ORDER BY margin DESC, doc_en ASC, doc_de ASC").fetchall()

print(f"[stage5] staged top-10: {staged}")
print(f"[stage5] engine top-10: {engine}")
if staged == engine:
    print(f"OK         q300_bitext_margin (staged): rows={len(engine)} value-exact")
else:
    print("MISMATCH   q300_bitext_margin (staged)")
    sys.exit(1)
