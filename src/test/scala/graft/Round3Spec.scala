package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Local pins for the round-3 driver queries (q83–q90) so a failure
  * localizes without the DuckDB gate.
  */
class Round3Spec extends SparkSuite {

  test("q83 bloom dedup removes exactly the corpus overlap") {
    val rows = Dedup.q83BloomDedup(spark, sf).collect()
    assert(rows.length == 200)
    // incoming = 0..299, corpus = 200..499: survivors are exactly 0..199
    assert(rows.map(_.getAs[Long]("doc_id")).max == 199L)
  }

  test("q84 batch ANN returns each planted twin at rank 1") {
    val rows = Similarity.q84AnnBatch(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Boolean]("ann_ok")))
  }

  test("q85 per-group cap and weighted-sample certification") {
    val rows = Sampling.q85CapWeighted(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_capped") ==
        math.min(r.getAs[Long]("n_total"), Sampling.Q85Cap.toLong))
      assert(r.getAs[Boolean]("weighted_ok"))
    }
  }

  test("q86 k-means step partitions the whole corpus into K clusters") {
    val rows = Similarity.q86KmeansStep(spark, sf).collect()
    assert(rows.length == Similarity.IvfK)
    assert(rows.map(_.getAs[Long]("n_members")).sum == 500L)
    rows.foreach(r => assert(!r.getAs[Double]("c0").isNaN))
  }

  test("q87 sessionize equals batch island detection minus open sessions") {
    val got = graft.streaming.StreamingOps.q87Sessionize(spark, sf)
      .agg(count(lit(1)), sum(col("n_events"))).collect()(0)
    // expected from the batch twin: per-user sessions with 30-min gaps,
    // dropping each user's last (still-open) session
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
    ev.createOrReplaceTempView("r3_events")
    val exp = spark.sql(
      """WITH g AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS is_new
           FROM r3_events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (SELECT user_id, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g),
         a AS (SELECT user_id, sid, count(*) AS n FROM s GROUP BY user_id, sid),
         l AS (SELECT user_id, max(sid) AS m FROM a GROUP BY user_id)
         SELECT count(*) AS n_sessions, sum(n) AS n_events
         FROM a JOIN l ON a.user_id = l.user_id AND a.sid < l.m""").collect()(0)
    assert(got.getLong(0) == exp.getAs[Long]("n_sessions"))
    assert(got.getLong(1) == exp.getAs[Long]("n_events"))
  }

  test("q88 delete+update rewrite keeps exactly the surviving rows") {
    val rows = EtlQueries.q88SqlDeleteUpdate(spark, sf).collect()
    val expectedN = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_totalprice") >= 50000.0).count()
    assert(rows.map(_.getAs[Long]("n")).sum == expectedN)
  }

  test("q89 schema drift reports added/removed/type-changed") {
    val rows = EtlQueries.q89SchemaDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      ("o_orderdate", "added", null, "timestamp"),
      ("o_retired_flag", "removed", "boolean", null),
      ("o_totalprice", "type_changed", "float", "double")))
  }

  test("q90 deterministic shuffle emits exactly the hash-order spec") {
    val r = Sampling.q90ShuffleDeterministic(spark, sf).collect()(0)
    assert(r.getAs[Long]("n") == 500L)
    assert(r.getAs[Boolean]("order_ok"))
  }

  test("q91 top-k UDAF equals the window-rank formulation") {
    val udaf = Relational.q91TopKUdaf(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = graft.sources.Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .orderBy(col("o_orderstatus"), col("rn"))
      .collect().map(r => (r.getAs[String]("o_orderstatus"),
        r.getAs[Int]("rn"), r.getAs[Long]("o_orderkey")))
    assert(udaf.toSeq == windowed.toSeq)
  }

  test("q92 foreachBatch sink replay appends nothing (idempotent)") {
    val rows = graft.streaming.StreamingOps.q92ForeachBatchSink(spark, sf).collect()
    val expected = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
  }

  test("q93 XML round-trip preserves values through markup") {
    val rows = EtlQueries.q93XmlRoundtrip(spark, sf).collect()
    val n = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 7 === 0).count()
    assert(rows.map(_.getAs[Long]("n")).sum == n)
  }

  test("q94 repetition signals: a planted degenerate doc scores high") {
    val rows = TextAnalysis.q94TextRepetition(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val dup = r.getAs[Double]("dup_trigram_frac")
      val top = r.getAs[Double]("top_word_frac")
      assert(dup >= 0.0 && dup <= 1.0)
      assert(top > 0.0 && top <= 1.0)
    }
  }

  test("q95 decontamination flags every planted doc") {
    val flagged = TextAnalysis.q95Decontamination(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    // docs >= 10 with doc_id % 50 == 0 carry the planted eval snippet
    val planted = (10L until 500L).filter(_ % 50 == 0)
    planted.foreach(id => assert(flagged.contains(id), s"planted doc $id not flagged"))
  }

  test("q96 JDBC round-trip pushes the filter into the Derby query") {
    val df = EtlQueries.q96JdbcRoundtrip(spark, sf)
    assert(df.collect().map(_.getAs[Long]("n")).sum ==
      graft.sources.Tables.nation(spark, sf).filter(col("n_regionkey") < 3).count())
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") || scan.toLowerCase.contains("jdbcrelation"),
      scan.take(800))
  }

  test("graft_fold_accents strips marks natively and stays inside codegen") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_fold_accents('Café Naïve Zürich résumé') AS f")
      .collect()(0).getString(0)
    assert(r == "Cafe Naive Zurich resume")
    assert(spark.sql("SELECT graft_fold_accents(CAST(NULL AS STRING)) AS f")
      .collect()(0).isNullAt(0))
    val plan = graft.sources.Tables.documents(spark, sf)
      .select(graft.functions.GraftFunctions.foldAccents(spark, col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("accentfoldexpr")),
      plan.take(500))
  }

  test("graft_cms_estimate rejects a non-integral probe item at analysis time") {
    graft.functions.GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_cms_estimate(CAST(NULL AS BINARY), 'one') AS c")
        .collect()
    }
    assert(e.getMessage.contains("graft_cms_estimate requires"))
  }

  test("asofJoin rejects colliding attach names and reserved left columns") {
    val l = spark.range(1).selectExpr("id AS k", "id AS ts", "id AS v")
    val r = spark.range(1).selectExpr("id AS k", "id AS ts", "id AS x")
    val e1 = intercept[IllegalArgumentException](
      Temporal.asofJoin(l, r, "k", "ts", Seq("x" -> "v"), "x"))
    assert(e1.getMessage.contains("collide"))
    val l2 = l.withColumnRenamed("v", "__v")
    val e2 = intercept[IllegalArgumentException](
      Temporal.asofJoin(l2, r, "k", "ts", Seq("x" -> "y"), "x"))
    assert(e2.getMessage.contains("reserved"))
  }
}
