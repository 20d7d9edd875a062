package graft

/** Streaming STATE-SCALE rehearsal (round-13 verdict item 3): drive the
  * stateful streaming family and report what the state store actually
  * HELD — peak/final `numRowsTotal` and peak `memoryUsedBytes` per
  * stateful operator, straight from the engine's per-batch
  * `stateOperators` progress (captured by [[graft.streaming.StateMetrics]]
  * inside every metered drive).
  *
  * The batch growth appendix measures wall-clock; this measures the one
  * dimension wall-clock cannot see: RESIDENT STATE. The laws being
  * rehearsed (asserted at fixture scale in Round14Spec, measured at
  * sf0.1 / sf1 here for SCALE.md):
  *  - streaming aggregations hold one state row per GROUP (windows×types,
  *    sessions, users) — never per input event;
  *  - streaming dedup holds one row per distinct KEY;
  *  - stream-stream joins buffer both sides only inside the watermark
  *    envelope — state follows the join-window population, not the
  *    stream length.
  * Linear-in-keys is the pass criterion: a 10× key population may grow
  * state ~10×; growth tracking the EVENT count past the key count (or
  * worse) means state leaks and a 100 TB deployment OOMs its stores.
  *
  * Output: one JSON line per query —
  * `{"query":…,"batches":…,"result_rows":…,"operators":[{"op":…,
  * "peak_rows":…,"final_rows":…,"peak_mem_bytes":…}]}` — plus a
  * denominator line with the key populations of the input at this SF.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.StreamStateBench"
  */
object StreamStateBench {

  private val Stateful = Seq(
    "q43_stream_tumbling_window",
    "q44_stream_session_window",
    "q45_stream_dedup",
    "q46_stream_stateful",
    "q52_stream_sliding_window",
    "q87_stream_sessionize",
    "q110_stream_stream_join",
    "q143_stream_outer_join")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.SparkConfigs.localSession("graft-stream-state", cpus)
    spark.sparkContext.setLogLevel("WARN")

    // key-population denominators (batch, exact)
    val ev = graft.sources.Tables.events(spark, sfDir)
    val denom = ev.selectExpr(
      "count(*) AS events",
      "count(DISTINCT user_id) AS users",
      "count(DISTINCT event_id) AS event_ids",
      "count(DISTINCT (CAST(ts AS DATE), CAST(hour(ts) AS INT), event_type)) AS hour_type_groups"
    ).collect()(0) // 1-row denominator readout
    println(
      s"""{"sf":"$sfDir","events":${denom.getLong(0)},"users":${denom.getLong(1)},""" +
        s""""event_ids":${denom.getLong(2)},"hour_type_groups":${denom.getLong(3)}}""")

    // SPARK_GRAFT_BENCH_ONLY=q44_...,q45_... restricts the drive — at sf10
    // each heavy stateful query gets its OWN JVM: the HDFS-backed provider
    // retains finished queries' state maps on-heap until maintenance
    // unloads them, so back-to-back multi-query drives conflate footprints
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val fns = SparkEntry.queries
    Stateful.filter(n => only.forall(_.contains(n))).foreach { name =>
      graft.streaming.StateMetrics.clear()
      val rows = fns(name)(spark, sfDir).count()
      val drives = graft.streaming.StateMetrics.drives
      val ops = drives.flatMap(_.operators).map { o =>
        s"""{"op":"${o.operatorName}","peak_rows":${o.peakRows},""" +
          s""""final_rows":${o.finalRows},"peak_mem_bytes":${o.peakMemoryBytes}}"""
      }.mkString("[", ",", "]")
      val batches = drives.map(_.batches).sum
      println(s"""{"query":"$name","batches":$batches,"result_rows":$rows,"operators":$ops}""")
    }
    spark.stop()
  }
}
