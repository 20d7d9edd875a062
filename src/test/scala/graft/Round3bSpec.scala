package graft

import graft.operators._

import org.apache.spark.sql.functions._

/** Specs for the round-3 second batch (q97+): clustering, linkage, layout
  * and skew operators. Expected values are pinned against DuckDB runs over
  * the same fixtures (see each query's oracle).
  */
class Round3bSpec extends SparkSuite {

  test("connectedComponents: chains, isolates, and min-label invariant") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("connectedComponents: empty edge set leaves every node a singleton") {
    import spark.implicits._
    val nodes = Seq(5L, 6L).toDF("id")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 5L, 6L -> 6L))
  }

  test("q98 fuzzy join: every emitted pair is within distance 1 and blocked") {
    val rows = Linkage.q98FuzzyJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("dist") == 1L)) // c_name values are unique
    // 000000001 vs 000000002 must link; 000000001 vs 000000012 must not (dist 2)
    val pairs = rows.map(r => (r.getAs[Long]("cust_a"), r.getAs[Long]("cust_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 12L)))
  }

  test("q102 snapshot diff: the three change kinds carry the planted keys") {
    val rows = Cdc.q102SnapshotDiff(spark, sf).collect()
    val byKind = rows.groupBy(_.getAs[String]("change_type"))
      .view.mapValues(_.map(_.getAs[Long]("o_orderkey")).toSet).toMap
    assert(byKind("added").forall(_ >= 10000000L))
    assert(byKind("deleted").forall(_ % 97 == 0))
    // changed = repriced keys that were not simultaneously deleted
    assert(byKind("changed").forall(k => k % 100 == 0 && k % 97 != 0))
  }

  test("q103/q104: salted plans equal their unsalted twins exactly") {
    import graft.sources.Tables
    val plainAgg = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n")).orderBy(col("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = Skew.q103SaltedAgg(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(salted == plainAgg)

    val plainJoin = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n_items"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val saltedJoin = Skew.q104SaltedJoin(spark, sf)
      .collect().map(r => (r.getAs[String]("p_brand"), r.getAs[Long]("n_items"))).toMap
    assert(saltedJoin == plainJoin)
  }

  test("q99 histogram: buckets partition the table and sums reconcile") {
    import graft.sources.Tables
    val rows = Profiling.q99Histogram(spark, sf).collect()
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(rows.map(_.getAs[Long]("bucket")).distinct.length == rows.length)
  }

  test("q105 vocab: frequencies sum to the corpus token count") {
    import graft.sources.Tables
    val rows = TextAnalysis.q105VocabTopK(spark, sf).collect()
    val tokens = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(rows.map(_.getAs[Long]("n")).sum == tokens) // vocab (31) < k (50)
    assert(rows.map(_.getAs[String]("word")).distinct.length == rows.length)
  }

  test("q106 gap fill: every user's span is dense and zero-filled days are silent") {
    import graft.sources.Tables
    val rows = EventAnalytics.q106GapFill(spark, sf).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val days = rs.map(_.getAs[java.sql.Timestamp]("day").getTime).sorted
      // consecutive days, no holes, no duplicates
      assert(days.sliding(2).forall { case Array(a, b) => b - a == 86400000L; case _ => true })
    }
    val filled = rows.filter(_.getAs[Long]("n_events") == 0L)
    assert(filled.forall(_.getAs[Double]("day_value") == 0.0))
    // real events reconcile: sum of n_events equals the table count
    assert(rows.map(_.getAs[Long]("n_events")).sum == Tables.events(spark, sf).count())
  }

  test("q107 funnel: stages are monotone and ordered in time") {
    val rows = EventAnalytics.q107Funnel(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t1, t2, t3) = (r.getAs[java.sql.Timestamp]("t1"),
        r.getAs[java.sql.Timestamp]("t2"), r.getAs[java.sql.Timestamp]("t3"))
      val stage = r.getAs[Int]("stage")
      assert((t3 != null) == (stage == 3))
      if (t3 != null) assert(t2 != null, "stage 3 requires stage 2")
      if (t2 != null) assert(t2.after(t1))
      if (t3 != null) assert(t3.after(t2))
    }
  }

  test("q108 cohort retention: offset 0 counts every cohort member exactly once") {
    import graft.sources.Tables
    val rows = EventAnalytics.q108CohortRetention(spark, sf).collect()
    val atZero = rows.filter(_.getAs[Int]("week_offset") == 0)
      .map(r => r.getAs[java.sql.Timestamp]("cohort_week") -> r.getAs[Long]("n_active")).toMap
    assert(atZero.values.sum == Tables.events(spark, sf)
      .select(col("user_id")).distinct().count())
    // retention never exceeds the cohort's size
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") <=
        atZero(r.getAs[java.sql.Timestamp]("cohort_week")))
    }
  }

  test("q97 dedup clusters: planted chains collapse, component = min id") {
    val rows = Dedup.q97DedupClusters(spark, sf).collect()
    assert(rows.length == 124) // 100 window + 2x12 planted
    val byComp = rows.groupBy(_.getAs[Long]("component"))
    // component label is the minimum doc_id of its cluster
    byComp.foreach { case (c, rs) => assert(rs.map(_.getAs[Long]("doc_id")).min == c) }
    // pinned against the DuckDB oracle at sf0.001: 12 non-trivial clusters
    assert(byComp.count(_._2.length > 1) == 12)
    // cluster_size is consistent with the actual component extent
    rows.foreach { r =>
      assert(r.getAs[Long]("cluster_size") ==
        byComp(r.getAs[Long]("component")).length.toLong)
    }
  }
}
