package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write-path layout control — the storage decisions that determine 100 TB
  * read performance. The reference's equivalents are its 1000-row chunks and
  * 50 MB request packing (/root/reference/pipeline.py:54,205); here layout
  * is declarative and the engine parallelizes:
  *
  *  - `writePartitioned`: hive-style partition directories → partition
  *    pruning at read (only matching directories are listed/scanned);
  *  - `writeBucketed`: pre-shuffled bucket files on the join/agg key → two
  *    tables bucketed the same way join with ZERO exchange;
  *  - `maxRecordsPerFile` caps file size so downstream tasks stay balanced.
  */
object Sinks {

  /** Partitioned parquet directory; `partitionCols` become directory keys
    * (e.g. event date) that Catalyst prunes on read.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L,
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed managed table: rows are hash-distributed into `numBuckets` by
    * `bucketCol` and sorted within buckets — joins and aggregations on the
    * bucket key skip their shuffle entirely.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, numBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
