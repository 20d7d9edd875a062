package graft.operators

import graft.sources.Tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-quality profiling — the first query anyone runs against a new
  * table, and the health check a 100 TB ingest pipeline runs per batch:
  * per-column null counts and distinct cardinalities in ONE pass over the
  * data (a single wide aggregate; Catalyst plans the multi-distinct via
  * Expand), melted to long form for reading. No per-column jobs, no
  * driver loops over columns — column count only widens the aggregate row.
  */
object Profiling {

  /** (column, n_nulls, n_distinct) per profiled column; `n_rows` repeated
    * on every row for ratio computation downstream.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      count_if(col(c).isNull).as(s"__nulls__$c"),
      countDistinct(col(c)).as(s"__distinct__$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c =>
      struct(lit(c).as("column"),
        col(s"__nulls__$c").as("n_nulls"),
        col(s"__distinct__$c").as("n_distinct")))
    wide.select(col("__n").as("n_rows"), explode(array(entries: _*)).as("p"))
      .select(col("p.column").as("column"), col("n_rows"),
        col("p.n_nulls").as("n_nulls"), col("p.n_distinct").as("n_distinct"))
  }

  // ---------------------------------------------------------------- q81
  /** Profile of the customer table — deterministic counts → full oracle
    * (the oracle replays it as one grouped-aggregate per column UNION ALL).
    */
  val Q81Cols: Seq[String] = Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")

  def q81Profile(spark: SparkSession, d: String): DataFrame =
    profile(Tables.customer(spark, d), Q81Cols)
      .orderBy(col("column"))

  val q81Oracle: String = Q81Cols.map { c =>
    s"""SELECT '$c' AS "column", count(*) AS n_rows,
        count(*) FILTER (WHERE $c IS NULL) AS n_nulls,
        count(DISTINCT $c) AS n_distinct FROM customer"""
  }.mkString("", "\n UNION ALL\n", "\n ORDER BY \"column\"")

  // ---------------------------------------------------------------- q99
  /** Equi-width histogram (numeric binning): bucket = ⌊x / width⌋ computed
    * with one floor over a double divide — identical IEEE ops in both
    * engines, so bucket boundaries agree bit-for-bit. One partial+final
    * hash aggregate, no shuffle beyond the 20-row bucket merge: histograms
    * of a 100 TB column cost one scan. The per-bucket exact sum uses the
    * repo-wide DECIMAL(25,6) contract.
    */
  def histogram(df: DataFrame, valueCol: String, width: Double): DataFrame =
    df.groupBy(floor(col(valueCol) / width).as("bucket"))
      .agg(count(lit(1)).as("n"),
        graft.core.Exact.dsum(col(valueCol)).as("bucket_sum"))

  def q99Histogram(spark: SparkSession, d: String): DataFrame =
    histogram(Tables.orders(spark, d), "o_totalprice", 25000.0)
      .orderBy(col("bucket"))

  val q99Oracle: String =
    """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS bucket_sum
       FROM orders GROUP BY 1 ORDER BY 1"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q81_profile" -> q81Profile _,
    "q99_histogram" -> q99Histogram _)

  val oracles: Map[String, String] = Map(
    "q81_profile" -> q81Oracle,
    "q99_histogram" -> q99Oracle)
}
