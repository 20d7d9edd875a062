package graft

import graft.operators.EventTime
import graft.streaming.StreamingOps

/** Streaming twins must produce exactly the batch event-time results (same
  * window functions, same data, complete output).
  */
class StreamingSpec extends SparkSuite {

  test("streaming tumbling == batch tumbling") {
    val batch = EventTime.q23TumblingWindow(spark, sf).collect()
    val stream = StreamingOps.q43StreamTumbling(spark, sf).collect()
    assert(stream.toSeq == batch.toSeq)
  }

  test("streaming session == batch session (count/start per session)") {
    val batch = EventTime.q25SessionWindow(spark, sf)
      .select("user_id", "session_start", "n_events").collect()
    val stream = StreamingOps.q44StreamSession(spark, sf)
      .select("user_id", "session_start", "n_events").collect()
    assert(stream.toSeq == batch.toSeq)
  }

  test("RocksDB state store produces identical results to the default store") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val viaRocks = StreamingOps.q43StreamTumbling(spark, sf).collect()
      val batch = EventTime.q23TumblingWindow(spark, sf).collect()
      assert(viaRocks.toSeq == batch.toSeq)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming dedup == batch distinct counts") {
    val stream = StreamingOps.q45StreamDedup(spark, sf).collect()
    val batch = graft.sources.Tables.events(spark, sf)
      .dropDuplicates("event_id")
      .groupBy("event_type").count()
      .orderBy("event_type").collect()
    assert(stream.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      batch.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("streaming sliding == batch sliding") {
    val batch = EventTime.q24SlidingWindow(spark, sf).collect()
    val stream = StreamingOps.q52StreamSliding(spark, sf).collect()
    assert(stream.toSeq == batch.toSeq)
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions matching batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val stream = graft.sources.Tables.eventsStream(spark, sf)
      .select(col("user_id"), col("ts").cast("timestamp"), col("event_type"), col("value"))
      .as[StreamingOps.UserEvent]
    val sessions = StreamingOps.sessionize(spark, stream, 30L)
    val name = s"sessionize_${System.nanoTime()}"
    val q = sessions.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table(name)
      .select("user_id", "session_start", "n_events")
      .orderBy("user_id", "session_start").collect()
    // batch truth: all sessions from the session_window operator; the
    // streaming side holds back each user's final (still-open) session
    val batch = EventTime.q25SessionWindow(spark, sf)
      .select("user_id", "session_start", "n_events").collect()
    val batchSet = batch.map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val streamSeq = streamed.map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    assert(streamSeq.nonEmpty)
    assert(streamSeq.forall(batchSet.contains),
      "every closed session must match a batch session_window row")
    val users = streamSeq.map(_._1).distinct.length
    // each user should emit all but their trailing open session
    assert(streamSeq.length >= batch.length - users - users)
  }

  test("stream-stream join matches the batch join (modulo end-of-stream watermark holdback)") {
    import org.apache.spark.sql.functions._
    val joined = StreamingOps.clickPurchaseAttribution(spark, sf)
      .select(col("click_id"), col("purchase_id"))
    val name = s"ss_join_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val ev = graft.sources.Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("pid"))
    val batchAll = c.join(p,
        col("cu") === col("pu") && col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"))
      .select(col("cid"), col("pid"), col("cts"), col("pts"))
    val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    // pairs whose constituent times are older than final-watermark minus the
    // join range MUST have been emitted; later pairs may be held back
    val cutoff = new java.sql.Timestamp(maxTs.getTime - (10 + 30 + 10) * 60000L)
    val mustEmit = batchAll
      .filter(col("cts") < lit(cutoff) && col("pts") < lit(cutoff))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = batchAll.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mustEmit.nonEmpty)
    assert(mustEmit.subsetOf(streamed), s"${(mustEmit -- streamed).size} due pairs missing")
    assert(streamed.subsetOf(all), "stream emitted pairs batch doesn't have")
  }

  test("left-outer stream-stream join emits watermark-proven unmatched clicks as nulls") {
    import org.apache.spark.sql.functions._
    val joined = StreamingOps.clickPurchaseAttributionOuter(spark, sf)
      .select(col("click_id"), col("purchase_id"), col("click_ts"))
    val name = s"ss_outer_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val out = spark.table(name).collect()
    val nullRows = out.filter(_.isNullAt(1))
    assert(nullRows.nonEmpty, "expected unmatched clicks with null purchase")
    // every null-emitted click must genuinely have no purchase within range
    val ev = graft.sources.Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val matchedClickIds = c.join(p,
        col("cu") === col("pu") && col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"), "left_semi")
      .select("cid").collect().map(_.getLong(0)).toSet
    nullRows.foreach { r =>
      assert(!matchedClickIds.contains(r.getLong(0)),
        s"click ${r.getLong(0)} emitted as unmatched but has a purchase in range")
    }
  }

  test("foreachBatch sink is idempotent: rerun adds no duplicate rows") {
    val table = "graft_stream_sink_t"
    StreamingOps.streamToTableForeachBatch(spark, sf, table)
    val afterFirst = spark.table(table).count()
    assert(afterFirst == graft.sources.Tables.events(spark, sf).count())
    // replay the same stream into the existing table: left-anti dedup
    // must make the second load a no-op
    val q = graft.sources.Tables.eventsStream(spark, sf)
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val existing = batch.sparkSession.table(table)
        batch.join(existing, Seq("event_id"), "left_anti")
          .write.mode("append").saveAsTable(table)
      }.start()
    try q.processAllAvailable()
    finally q.stop()
    assert(spark.table(table).count() == afterFirst)
    spark.sql(s"DROP TABLE $table")
  }

  test("stateful per-user stats match batch aggregation") {
    val stream = StreamingOps.q46StreamStateful(spark, sf).collect()
    import org.apache.spark.sql.functions._
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"))
      .orderBy("user_id").collect()
    assert(stream.length == batch.length)
    stream.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[Long]("user_id") == b.getAs[Long]("user_id"))
      assert(s.getAs[Long]("n_events") == b.getAs[Long]("n_events"))
      assert(s.getAs[Long]("n_purchases") == b.getAs[Long]("n_purchases"))
      assert(math.abs(s.getAs[Double]("total_value") - b.getAs[Double]("total_value")) < 0.05)
    }
  }
}
