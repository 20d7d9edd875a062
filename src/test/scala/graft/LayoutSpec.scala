package graft

import graft.operators.Skew
import graft.sources.{Sinks, Tables}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Storage-layout scale mechanics: bucketed joins must not shuffle,
  * partitioned reads must prune directories, salting must preserve results.
  */
class LayoutSpec extends SparkSuite {

  test("bucketed tables join with zero exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Sinks.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_custkey", 8)
    Sinks.writeBucketed(
      Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer", "o_custkey", 8)
    // disable broadcast so the planner must consider the shuffle it would
    // otherwise need — bucketing removes it (sort-merge join directly on
    // bucket files)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(800)}")
      assert(joined.count() == Tables.orders(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_customer")
  }

  test("partitioned write + partition pruning on read") {
    val dir = Files.createTempDirectory("graft-part").toString
    val events = Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
    Sinks.writePartitioned(events, dir, Seq("event_date"))
    val firstDate = events.select(min(col("event_date"))).collect()(0).getDate(0)
    val pruned = spark.read.parquet(dir).filter(col("event_date") === lit(firstDate))
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("event_date"),
      s"expected partition pruning, got: ${scan.take(400)}")
    assert(pruned.count() ==
      events.filter(col("event_date") === lit(firstDate)).count())
  }

  test("maxRecordsPerFile caps output file sizes") {
    val dir = Files.createTempDirectory("graft-maxrec").toString
    Sinks.writePartitioned(
      Tables.orders(spark, sf).repartition(1), dir, Nil, maxRecordsPerFile = 500)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files >= 3, s"1500 rows at 500/file should produce >=3 files, got $files")
  }

  test("salted count equals plain count on a skewed column") {
    val plain = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag").as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("key")).collect()
    val salted = Skew.saltedCount(Tables.lineitem(spark, sf), col("l_returnflag"), 16)
      .orderBy(col("key")).collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      plain.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("salted join equals plain join") {
    val fact = Tables.orders(spark, sf)
    val dim = Tables.customer(spark, sf)
    val plain = fact.join(dim, fact("o_custkey") === dim("c_custkey")).count()
    val salted = Skew.saltedJoin(fact, dim, "o_custkey", "c_custkey", 8).count()
    assert(salted == plain)
  }
}
