package graft

import org.apache.spark.sql.streaming.OutputMode

/** Round-16 hardening (round-15 ADVICE).
  *
  *  - Append-mode `runToScratch` with a REUSED query name must not read
  *    back a prior invocation's surviving `batch_N` epoch directories.
  *    All current callers use nanoTime-unique names, so the defect could
  *    not trigger today — but the contract was implicit; the fix clears
  *    the scratch dir at run start and this pins it with two real stream
  *    drives sharing a name, the second producing FEWER micro-batches
  *    than the first (the exact shape that resurrected stale epochs).
  */
class Round16Spec extends SparkSuite {

  test("append-mode runToScratch with a reused name never reads stale epochs") {
    import graft.streaming.StreamingOps
    val in1 = graft.core.Scratch.dir("test-reuse-in1")
    val in2 = graft.core.Scratch.dir("test-reuse-in2")
    // run 1: two input files -> maxFilesPerTrigger=1 -> TWO append batches
    spark.range(0, 10).selectExpr("id", "id * 2 AS v")
      .repartition(1).write.mode("overwrite").parquet(s"$in1/f0")
    spark.range(10, 20).selectExpr("id", "id * 2 AS v")
      .repartition(1).write.mode("overwrite").parquet(s"$in1/f1")
    // run 2: one input file -> ONE append batch (fewer than run 1)
    spark.range(100, 105).selectExpr("id", "id * 2 AS v")
      .repartition(1).write.mode("overwrite").parquet(s"$in2/f0")
    val schema = spark.read.parquet(s"$in1/f0").schema
    def stream(dir: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").parquet(dir)

    val name = "test_reuse_epochs" // deliberately IDENTICAL across runs
    val r1 = StreamingOps.runToScratch(spark, stream(in1), name, OutputMode.Append())
      .collect()
    assert(r1.length === 20)
    val r2 = StreamingOps.runToScratch(spark, stream(in2), name, OutputMode.Append())
      .collect()
    // without the run-start clear, run 1's surviving batch_1 epoch leaks in
    assert(r2.map(_.getLong(0)).sorted === Array(100L, 101L, 102L, 103L, 104L))
  }
}
