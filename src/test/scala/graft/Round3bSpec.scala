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
