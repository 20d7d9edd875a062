package graft.operators

import graft.sources.Tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Change-data-capture primitives: diff two snapshots of a table into
  * added / deleted / changed rows. The reference pipeline reloads whole
  * tables on every run (`if_exists='replace'`, /root/reference/pipeline.py:213);
  * snapshot diffing is what replaces that at warehouse scale — ship the
  * delta, not the table.
  *
  * 100 TB shape: one full-outer shuffle join on the key (both sides hash-
  * partitioned by the same key → co-located compare), change predicate
  * evaluated columnar per row, output is the (usually tiny) delta. With
  * bucketed/pre-partitioned snapshots (q101's layout) even that shuffle
  * disappears.
  */
object Cdc {

  /** Row-level diff of `newer` vs `older` keyed by `keyCol`; rows whose
    * `compareCols` all match are dropped as unchanged.
    * Output: key, change_type ∈ {added, deleted, changed}.
    */
  def snapshotDiff(older: DataFrame, newer: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    val o = older.select((keyCol +: compareCols).map(col): _*).as("o")
    val n = newer.select((keyCol +: compareCols).map(col): _*).as("n")
    val joined = o.join(n, col(s"o.$keyCol") === col(s"n.$keyCol"), "full_outer")
    val changed = compareCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduce(_ || _)
    joined
      .withColumn("change_type",
        when(col(s"o.$keyCol").isNull, lit("added"))
          .when(col(s"n.$keyCol").isNull, lit("deleted"))
          .when(changed, lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(coalesce(col(s"o.$keyCol"), col(s"n.$keyCol")).as(keyCol),
        col("change_type"))
  }

  // ---------------------------------------------------------------- q102
  /** Snapshot diff driven end-to-end on a synthetically evolved orders
    * snapshot: every 97th order deleted, every 100th repriced (+1.00), and
    * one synthetic insert per 500th key. Fully deterministic construction →
    * full DuckDB oracle replaying the same evolution.
    */
  def q102SnapshotDiff(spark: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val evolved = orders
      .filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 100 === 0, col("o_totalprice") + 1.0d)
          .otherwise(col("o_totalprice")))
      .unionByName(orders.filter(col("o_orderkey") % 500 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice")))
    snapshotDiff(orders, evolved, "o_orderkey",
        Seq("o_orderstatus", "o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  val q102Oracle: String =
    """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
       n AS (
         SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 1.0
                ELSE o_totalprice END AS o_totalprice
         FROM o WHERE o_orderkey % 97 <> 0
         UNION ALL
         SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
         FROM o WHERE o_orderkey % 500 = 0),
       j AS (
         SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'deleted'
                WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                  THEN 'changed' END AS change_type
         FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
       SELECT o_orderkey, change_type FROM j
       WHERE change_type IS NOT NULL ORDER BY o_orderkey"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_snapshot_diff" -> q102SnapshotDiff _)

  val oracles: Map[String, String] = Map(
    "q102_snapshot_diff" -> q102Oracle)
}
