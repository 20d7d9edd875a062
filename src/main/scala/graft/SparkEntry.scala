package graft

import graft.operators._
import graft.streaming.StreamingOps

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's operator inventory (SURVEY.md §2): one entry per
  * operator family, assembled from the per-module catalogs; `oracleSql` pairs
  * each SQL-expressible entry with ANSI SQL the driver runs in DuckDB over
  * the same parquet tables. Hash-valued / nondeterministic operators
  * (MinHash, SimHash, LSH, raw encryption, stateful streaming) have no
  * oracle entry and get the driver's rows-only check; their semantics are
  * pinned in ScalaTest instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Scalars.queries ++ EventTime.queries ++
      EtlQueries.queries ++ Dedup.queries ++ Similarity.queries ++
      TextAnalysis.queries ++ Multimodal.queries ++ StreamingOps.queries ++
      Curation.queries ++ Temporal.queries ++ Sampling.queries ++
      Profiling.queries ++ Linkage.queries ++ Skew.queries ++ Cdc.queries ++
      EventAnalytics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Scalars.oracles ++ EventTime.oracles ++
      EtlQueries.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      TextAnalysis.oracles ++ Multimodal.oracles ++ StreamingOps.oracles ++
      Curation.oracles ++ Temporal.oracles ++ Sampling.oracles ++
      Profiling.oracles ++ Linkage.oracles ++ Skew.oracles ++ Cdc.oracles ++
      EventAnalytics.oracles
}
