package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the warehouse's parquet tables. Scans are plain
  * `spark.read.parquet` so Catalyst keeps full pushdown/pruning freedom —
  * filters and projections land in the parquet scan (`PushedFilters`,
  * `ReadSchema`), which is the property that matters at 100 TB.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects outright. Read it as raw nanos (legacy long mode) and truncate
    * to microseconds — the same ns→µs floor DuckDB applies natively, so both
    * engines see identical values.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set once at
    * session build by [[graft.core.SparkConfigs.ScaleDefaults]] (every repo
    * entry point builds through it). Readers deliberately do NOT set it —
    * a reader mutating shared session state would silently change how
    * unrelated parquet reads treat nanos columns.
    */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  /** ns(long) → µs timestamp; `div` is integer division (a double division
    * would lose precision above 2^53 ns).
    */
  val EventsTsToMicros = "timestamp_micros(ts div 1000)"

  /** Normalize `ts` to TimestampType regardless of how the file stored it:
    * TIMESTAMP(NANOS) surfaces as raw long nanos (nanosAsLong) → ns→µs
    * conversion; TIMESTAMP(MICROS) surfaces as TimestampType directly
    * (inferTimestampNTZ=false) → passthrough. Both land on identical µs
    * values under the UTC session zone, matching DuckDB's native read.
    */
  private def withEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr(EventsTsToMicros))
          .select(df.columns.map(col).toIndexedSeq: _*)
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
          .select(df.columns.map(col).toIndexedSeq: _*)
      case _ => df
    }
  }

  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def events(spark: SparkSession, d: String): DataFrame = withEventTs(eventsRaw(spark, d))

  /** Schema of the raw events file (ts as long nanos) for readStream. */
  def eventsRawSchema(spark: SparkSession, d: String): org.apache.spark.sql.types.StructType =
    eventsRaw(spark, d).schema

  /** One staged single-file directory per (dataset dir, table), created on
    * first use and registered for JVM-exit deletion — round 9 closes the
    * r8 advice's disk leak (every eventsStream/embeddingsStream call used
    * to mint a fresh temp dir that outlived the process). The hardlink
    * (copy on cross-filesystem) is idempotent per key, so repeated stream
    * constructions over one dataset reuse one directory.
    */
  private val stagedDirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), java.nio.file.Path]()
  private def stagedSingleFileDir(d: String, tableFile: String): java.nio.file.Path =
    stagedDirs.computeIfAbsent((d, tableFile), { _ =>
      import java.nio.file.{Files, Paths}
      val dir = Files.createTempDirectory(s"graft-stream-${tableFile.takeWhile(_ != '.')}")
      val dst = dir.resolve(tableFile)
      try Files.createLink(dst, Paths.get(s"$d/$tableFile"))
      catch { case _: Exception => Files.copy(Paths.get(s"$d/$tableFile"), dst) }
      dir.toFile.deleteOnExit(); dst.toFile.deleteOnExit()
      dir
    })

  /** Streaming twin of `events`: file-source readStream + the same ns→µs
    * conversion. Spark's file stream source wants a directory to monitor;
    * the single-file fixture is staged into a cached temp dir via hardlink
    * (a real deployment streams from a landing directory already).
    */
  def eventsStream(spark: SparkSession, d: String): DataFrame =
    withEventTs(
      spark.readStream.schema(eventsRawSchema(spark, d))
        .parquet(stagedSingleFileDir(d, "events.parquet").toString))
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")

  /** File-source stream over the embeddings table (the eventsStream
    * pattern): the parquet file hard-linked into the cached staged dir so
    * the stream sees exactly one input file, schema taken from the batch
    * table.
    */
  def embeddingsStream(spark: SparkSession, d: String): DataFrame =
    spark.readStream.schema(embeddings(spark, d).schema)
      .parquet(stagedSingleFileDir(d, "embeddings.parquet").toString)

  /** File-source stream over the documents table (same pattern). */
  def documentsStream(spark: SparkSession, d: String): DataFrame =
    spark.readStream.schema(documents(spark, d).schema)
      .parquet(stagedSingleFileDir(d, "documents.parquet").toString)
}
