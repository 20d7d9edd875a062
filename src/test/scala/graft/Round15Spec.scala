package graft

/** Round-15 hardening (round-14 ADVICE + verdict items).
  *
  *  - The scratch sink behind key-linear streaming output is now
  *    replay-idempotent in append mode: a foreachBatch sink is
  *    at-least-once, so a re-delivered micro-batch (failure between sink
  *    write and checkpoint commit) must not double-append. Each append
  *    batch overwrites its own `batch_<id>` epoch directory; the forced
  *    replay is exercised here directly against the extracted writer.
  *  - The streaming state-store provider flag fails FAST on unrecognized
  *    values: a typo at a 100×-scale rehearsal must not silently fall back
  *    to the on-heap provider.
  *  - runToScratch names its query, so StateMetrics drives are keyed by a
  *    real query name rather than null.
  */
class Round15Spec extends SparkSuite {

  // -------------------------------------- scratch-sink replay idempotence
  test("append-mode scratch sink is idempotent under micro-batch replay") {
    import graft.streaming.StreamingOps
    val dir = graft.core.Scratch.dir("test-replay-append") // JVM-exit cleaned
    val b0 = spark.range(0, 10).selectExpr("id", "id * 2 AS v")
    val b1 = spark.range(10, 15).selectExpr("id", "id * 2 AS v")
    StreamingOps.writeScratchBatch(b0, 0L, dir, append = true)
    StreamingOps.writeScratchBatch(b1, 1L, dir, append = true)
    def readAll() = spark.read.schema(b0.schema)
      .option("recursiveFileLookup", "true").parquet(dir)
    val before = readAll().orderBy("id").collect().toSeq
    assert(before.length === 15)
    // forced replay: batch 0 is re-delivered after a simulated failure
    // between sink write and checkpoint commit — output must not change
    StreamingOps.writeScratchBatch(b0, 0L, dir, append = true)
    val after = readAll().orderBy("id").collect().toSeq
    assert(after === before)
  }

  test("complete-mode scratch sink: last delivered batch IS the result") {
    import graft.streaming.StreamingOps
    val dir = graft.core.Scratch.dir("test-replay-complete") // JVM-exit cleaned
    val b0 = spark.range(0, 10).selectExpr("id", "id * 2 AS v")
    val b1 = spark.range(0, 4).selectExpr("id", "id * 3 AS v")
    StreamingOps.writeScratchBatch(b0, 0L, dir, append = false)
    StreamingOps.writeScratchBatch(b1, 1L, dir, append = false)
    // replay of the final batch changes nothing
    StreamingOps.writeScratchBatch(b1, 1L, dir, append = false)
    val rows = spark.read.parquet(dir).orderBy("id").collect().toSeq
    assert(rows.length === 4)
    assert(rows.map(_.getLong(1)) === Seq(0L, 3L, 6L, 9L))
  }

  // -------------------------------------- state-store provider resolution
  test("state provider flag resolves rocksdb, defaults hdfs, rejects typos") {
    import graft.core.SparkConfigs.stateProviderClass
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    assert(stateProviderClass(Some("rocksdb")) === Some(rocks))
    assert(stateProviderClass(Some(" RocksDB ")) === Some(rocks)) // normalized
    assert(stateProviderClass(Some("hdfs")) === None)
    assert(stateProviderClass(Some("")) === None)
    assert(stateProviderClass(None) === None)
    val e = intercept[IllegalArgumentException] {
      stateProviderClass(Some("rocks")) // the typo that must not be silent
    }
    assert(e.getMessage.contains("not recognized"))
  }

  // -------------------------------------- recursive CTE stays an equi-join
  test("q137: the frontier-step predicate plans a hash join, never nested-loop") {
    // The sf10 rehearsal caught the OR-of-equalities spelling planning a
    // broadcast nested-loop of frontier x customer per step (385.8 s at
    // 100x vs 7.9 s hash-joined). The DIV-form predicate must stay an
    // equi-join to Catalyst; a regression reintroduces a silent
    // 100x-scale killer invisible at fixture scale.
    //
    // Asserting over q137's own executedPlan is VACUOUS: UnionLoopExec
    // stores the recursion step as a LogicalPlan replanned per iteration at
    // runtime, so the top-level plan string never shows the step's join
    // node under EITHER spelling (round-15 ADVICE, verified empirically).
    // Instead, plan ONE frontier step directly — a one-row frontier joined
    // to customer on exactly the predicate q137's recursion uses — and pin
    // both directions: the DIV form must hash-join, and the OR form (the
    // counterfactual this guards against) must still nested-loop, proving
    // the probe can fail.
    graft.operators.Relational.q137RecursiveCte(spark, sf).collect() // registers customer_rec
    // The frontier must be a genuine relation (like the recursion's
    // previous-iteration output) — a literal one-row subquery constant-folds
    // the key into the scan filter and no join is planned at all.
    spark.range(1, 4).selectExpr("id AS k").createOrReplaceTempView("frontier_probe")
    def stepPlan(pred: String): String = spark.sql(
      s"""SELECT c.c_custkey FROM frontier_probe w
          JOIN customer_rec c ON $pred""").queryExecution.executedPlan.toString
    val divPlan = stepPlan("c.c_custkey DIV 2 = w.k")
    assert(divPlan.contains("HashJoin"),
      "frontier step no longer hash-joins:\n" + divPlan.take(800))
    assert(!divPlan.contains("BroadcastNestedLoopJoin"), divPlan.take(800))
    assert(!divPlan.contains("CartesianProduct"), divPlan.take(800))
    val orPlan = stepPlan("c.c_custkey = w.k * 2 OR c.c_custkey = w.k * 2 + 1")
    assert(orPlan.contains("BroadcastNestedLoopJoin"),
      "probe lost sensitivity — the OR spelling should still plan a " +
        "nested-loop; if Catalyst learned to hash OR-of-equalities, " +
        "re-validate the q137 spelling and update this pin:\n" + orPlan.take(800))
  }

  // -------------------------------------- scratch drives carry query names
  test("runToScratch drives record a non-null query name in StateMetrics") {
    graft.streaming.StateMetrics.clear()
    val out = graft.streaming.StreamingOps.q44StreamSession(spark, sf)
    assert(out.count() > 0)
    val drives = graft.streaming.StateMetrics.drives
    assert(drives.nonEmpty)
    drives.foreach { d =>
      assert(d.query != null && d.query.startsWith("stream_session_"))
    }
  }
}
