package graft.operators

import graft.sources.Tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The end-to-end training-corpus curation pipeline — the workflow the
  * individual operators exist for, composed: quality gate → exact dedup →
  * near-dup dedup → language selection → stats. Each stage is one of the
  * already-verified operators; the composition itself stays one lazy plan
  * until the sink, so Catalyst can fuse the filters and prune columns
  * end-to-end.
  *
  * Scale shape: two shuffles total for the deterministic stages (exact-dedup
  * group, final stats group) plus the LSH bucket join when near-dup removal
  * is enabled. Nothing is quadratic, nothing collects.
  */
object Curation {

  final case class CurationConfig(
      minTokens: Int = 20,
      maxStopwordRatio: Double = 0.5,
      langs: Seq[String] = Seq("en", "de", "es", "fr", "zh"),
      nearDupThreshold: Option[Double] = None) // None = exact-only (deterministic)

  /** Returns the curated documents (kept rows, original columns). */
  def curate(docs: DataFrame, cfg: CurationConfig = CurationConfig()): DataFrame = {
    val stops = TextAnalysis.Lexicons("en").map(w => s"'$w'").mkString(", ")
    // 1. quality gate (codegen'd expressions, fused into the scan filter)
    val quality = docs
      .withColumn("__n_tokens", size(split(col("text"), " ")))
      .withColumn("__stop_cnt", expr(s"size(filter(split(text, ' '), x -> x IN ($stops)))"))
      .filter(col("__n_tokens") >= cfg.minTokens &&
        col("__stop_cnt").cast("double") / col("__n_tokens") <= cfg.maxStopwordRatio &&
        col("lang").isInCollection(cfg.langs))
    // 2. exact dedup: keep the lowest doc_id per identical text. Partition by
    //    a pair of independent 64-bit content hashes, not the text itself —
    //    the shuffle key is 16 bytes instead of the document body (same
    //    collision argument as Dedup.exactDedup: ~2⁻¹²⁹ per pair).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(xxhash64(col("text")), xxhash64(lit(42L), col("text")))
      .orderBy(col("doc_id"))
    val exact = quality
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__n_tokens", "__stop_cnt")
    // 3. optional near-dup removal: drop the higher-id side of every
    //    MinHash-LSH pair above the threshold
    cfg.nearDupThreshold match {
      case None => exact
      case Some(t) =>
        val dupIds = Dedup.minhashNearDups(exact, t)
          .select(col("doc_b").as("doc_id")).distinct()
        exact.join(dupIds, Seq("doc_id"), "left_anti")
    }
  }

  /** Per-source summary of the curated corpus. */
  def curationStats(curated: DataFrame): DataFrame =
    curated.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).cast("long").as("total_tokens"),
        min(col("doc_id")).as("min_doc_id"))
      .orderBy(col("source"))

  // ---------------------------------------------------------------- q69
  /** Deterministic curation pipeline (quality gate + exact dedup + lang
    * selection, near-dup off) with per-source stats — the whole workflow as
    * one oracle-checked query.
    */
  def q69CurationPipeline(spark: SparkSession, d: String): DataFrame =
    curationStats(curate(Tables.documents(spark, d),
      CurationConfig(minTokens = 20, maxStopwordRatio = 0.5,
        langs = Seq("en", "de", "fr"))))

  val q69Oracle: String = {
    val stops = TextAnalysis.Lexicons("en").map(w => s"'$w'").mkString(", ")
    s"""WITH quality AS (
         SELECT *, len(string_split(text, ' ')) AS n_tokens,
                len(list_filter(string_split(text, ' '), x -> x IN ($stops))) AS stop_cnt
         FROM documents
         WHERE len(string_split(text, ' ')) >= 20
           AND CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stops))) AS DOUBLE)
               / len(string_split(text, ' ')) <= 0.5
           AND lang IN ('en', 'de', 'fr')),
       deduped AS (
         SELECT * FROM (
           SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM quality)
         WHERE rn = 1)
       SELECT source, count(*) AS n_docs,
              CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
              min(doc_id) AS min_doc_id
       FROM deduped GROUP BY source ORDER BY source"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q69_curation_pipeline" -> q69CurationPipeline _)

  val oracles: Map[String, String] = Map(
    "q69_curation_pipeline" -> q69Oracle)
}
