package graft.operators

import graft.sources.Tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Record linkage: fuzzy (edit-distance) joins with blocking. The reference
  * pipeline loads entity tables (customers, suppliers) whose identifiers
  * arrive dirty in real feeds; linking near-identical names is the standard
  * warehouse-side cleanup. Spark-first shape: blocking turns the O(n²)
  * all-pairs distance computation into Σ block² — the same cost argument as
  * LSH banding in [[Dedup]] — and `levenshtein(l, r, threshold)` (Spark ≥
  * 3.5) early-exits the DP at the bound instead of filling the full matrix.
  *
  * 100 TB notes: the self-join shuffles on the block key only; block-size
  * skew is the failure mode (a giant block re-quadratizes), so real feeds
  * pick block keys with bounded selectivity (prefix+length, phonetic code,
  * sorted-neighborhood windows) — and the recall cost of blocking is
  * explicit: pairs whose edits fall inside the block key are missed. That
  * tradeoff is inherent to blocked linkage, not an implementation shortcut.
  */
object Linkage {

  /** All pairs within a block whose edit distance ≤ maxDist. Pairs are
    * ordered (idA < idB) to emit each match once.
    */
  def fuzzySelfJoin(df: DataFrame, idCol: String, nameCol: String,
                    blockPrefixLen: Int, maxDist: Int): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(nameCol).as("name"),
      substring(col(nameCol), 1, blockPrefixLen).as("blk"))
    val a = keyed.as("a")
    val b = keyed.as("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      // thresholded levenshtein early-exits at maxDist+1 (returns -1 beyond)
      .withColumn("dist",
        levenshtein(col("a.name"), col("b.name"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("dist"))
  }

  // ---------------------------------------------------------------- q98
  /** Customer-name linkage: block on the 16-char name prefix, link names
    * within edit distance 1. Deterministic → full DuckDB oracle (DuckDB
    * ships the same `levenshtein`).
    */
  def q98FuzzyJoin(spark: SparkSession, d: String): DataFrame =
    fuzzySelfJoin(Tables.customer(spark, d), "c_custkey", "c_name",
        blockPrefixLen = 16, maxDist = 1)
      .select(col("id_a").as("cust_a"), col("id_b").as("cust_b"), col("dist"))
      .orderBy(col("cust_a"), col("cust_b"))

  val q98Oracle: String =
    """WITH c AS (SELECT c_custkey, c_name, substr(c_name, 1, 16) AS blk
                  FROM customer)
       SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
              levenshtein(a.c_name, b.c_name) AS dist
       FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
       WHERE levenshtein(a.c_name, b.c_name) <= 1
       ORDER BY cust_a, cust_b"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q98_fuzzy_join" -> q98FuzzyJoin _)

  val oracles: Map[String, String] = Map(
    "q98_fuzzy_join" -> q98Oracle)
}
