package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.nio.file.Files
import java.sql.Timestamp

/** Watermark semantics under late data: append-mode windows finalize once
  * the watermark passes, and rows arriving behind the watermark are dropped
  * — the state-eviction contract that bounds memory on an unbounded stream.
  */
class WatermarkSpec extends SparkSuite {

  private def ts(hhmm: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("append-mode tumbling window drops data behind the watermark") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-late").toString

    def writeBatch(rows: Seq[(Timestamp, Long)]): Unit =
      rows.toDF("ts", "v").coalesce(1).write.mode("append").parquet(dir)

    // batch 1: two rows in window [00:00,01:00), two in [01:00,02:00),
    // one at 02:30 pushing the watermark to 02:20
    writeBatch(Seq(
      ts("00:05") -> 1L, ts("00:10") -> 1L,
      ts("01:05") -> 1L, ts("01:10") -> 1L,
      ts("02:30") -> 1L))

    val stream = spark.readStream
      .schema("ts TIMESTAMP, v BIGINT")
      .parquet(dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))

    val name = s"wm_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // batch 2: a LATE row for the already-finalized 00:00 window (behind
      // the 02:20 watermark -> must be dropped) plus a fresh row at 04:00
      // that finalizes the 02:00 window
      writeBatch(Seq(ts("00:15") -> 99L, ts("04:00") -> 1L))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table(name).orderBy("ws").collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    // the 00:00 window emitted with its on-time count only — late row dropped
    assert(rows("2024-01-01 00:00:00.0") == 2L,
      s"late row was not dropped: $rows")
    assert(rows("2024-01-01 01:00:00.0") == 2L)
    assert(rows("2024-01-01 02:00:00.0") == 1L)
  }

  test("checkpointed aggregation state survives a query restart") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft-ckpt-src").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    def writeBatch(rows: Seq[(Timestamp, Long)]): Unit =
      rows.toDF("ts", "v").coalesce(1).write.mode("append").parquet(srcDir)

    def startQuery(name: String) = spark.readStream
      .schema("ts TIMESTAMP, v BIGINT")
      .parquet(srcDir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete()).start()

    writeBatch(Seq(ts("00:05") -> 1L, ts("00:10") -> 1L, ts("01:05") -> 1L))
    val q1 = startQuery("ckpt_run1")
    try q1.processAllAvailable() finally q1.stop()

    // second incarnation, same checkpoint: must resume state, process ONLY
    // the new file, and still report totals over both batches
    writeBatch(Seq(ts("00:20") -> 1L, ts("02:05") -> 1L))
    val q2 = startQuery("ckpt_run2")
    try q2.processAllAvailable() finally q2.stop()

    val counts = spark.table("ckpt_run2").collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(counts("2024-01-01 00:00:00.0") == 3L) // 2 old + 1 new, not reread
    assert(counts("2024-01-01 01:00:00.0") == 1L)
    assert(counts("2024-01-01 02:00:00.0") == 1L)
  }

  test("dropDuplicatesWithinWatermark evicts dedup state by event time") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dedup-wm").toString

    Seq((ts("00:05"), 1L), (ts("00:06"), 1L), (ts("02:00"), 2L))
      .toDF("ts", "id").coalesce(1).write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema("ts TIMESTAMP, id BIGINT")
      .parquet(dir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")

    val name = s"wmd_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable()
    finally q.stop()
    // id=1 appears twice within the watermark window -> deduped to one row
    assert(spark.table(name).count() == 2)
  }
}
