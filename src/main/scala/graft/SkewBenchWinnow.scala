package graft

import org.apache.spark.sql.functions._

/** Adversarial-skew rehearsal for the winnowing admission join (round 9;
  * the SCALE.md "universal boilerplate fingerprint" note, measured): when
  * EVERY corpus document carries the same boilerplate span — a site
  * footer, a license header — the span's interior window selections give
  * one fingerprint hash `sh` whose posting list in the q316 index is
  * corpus-sized. q317/q325's admission join (batch fingerprints ⋈ index
  * on sh) then fans out batch-hot-fp × corpus on that single key.
  *
  * Two probe strategies are timed against the same hot index:
  *  - RAW join (the fixture path): batch (doc, sh) ⋈ full index rows —
  *    the hot key lands in one task unless AQE's OptimizeSkewedJoin
  *    splits it; fan-out is real work either way;
  *  - DF-SUMMARY join (the 100 TB path): the index pre-aggregates to one
  *    (sh, df) row per hash — by construction skew-IMMUNE (every key is
  *    1 row on the index side), and sufficient for the Σ-df hit count
  *    and the flag decision (df ≥ 1). Only ref-attribution needs raw
  *    rows, and that leg joins a CAPPED per-hash ref list (q223/q224
  *    discipline).
  *
  * Invariant under skew: every batch doc is an exact corpus copy, so
  * every one must flag — an unflagged copy means hot-key rows were LOST,
  * a correctness failure rather than a straggler.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        SPARK_GRAFT_SKEW_MULT=8 sbt "runMain graft.SkewBenchWinnow"
  */
object SkewBenchWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SKEW_MULT", "1").toInt
    val spark = graft.core.SparkConfigs.localSession("graft-skewbench-winnow", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val span = graft.operators.Dedup.Q305Span
    val k = graft.operators.Dedup.Q305K
    val w = graft.operators.Dedup.Q305W
    val corpus = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select(
        (col("doc_id") + col("rep") * 100000000L).as("doc_id"),
        concat(col("text"), lit(" " + span)).as("text"))
    corpus.groupBy().count().collect() // warm scan/codegen
    val nDocs = corpus.count()

    // the hot index: materialized once so both probe strategies pay the
    // same build and the timed delta is the JOIN shape only
    val idx = graft.operators.Dedup.winnowSelect(corpus, k, w)
      .select(col("doc_id").as("ref_id"), col("sh"))
      .localCheckpoint() // rehearsal-sized (bench harness)
    val dfSummary = idx.groupBy(col("sh"))
      .agg(count(lit(1)).as("df")).localCheckpoint() // rehearsal-sized df summary (bench harness)
    val hotTop = dfSummary.orderBy(col("df").desc).limit(1)
      .collect()(0).getLong(1)

    val batch = corpus.filter(col("doc_id") % 100000000L < 100)
      .filter(col("doc_id") < 100000000L)
      .select((col("doc_id") + 500000000L).as("doc_id"), col("text"))
    val bsel = graft.operators.Dedup.winnowSelect(batch, k, w)
      .select(col("doc_id"), col("sh")).distinct().localCheckpoint() // rehearsal-batch-sized (bench harness)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val rawSec = time(
      bsel.join(idx, "sh")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit_pairs"))
        .write.mode("overwrite").format("noop").save())
    val dfSec = time(
      bsel.join(dfSummary, "sh")
        .groupBy(col("doc_id")).agg(expr("cast(sum(df) as bigint)").as("n_hit_pairs"))
        .write.mode("overwrite").format("noop").save())

    val unflagged = batch.select(col("doc_id"))
      .join(bsel.join(dfSummary, "sh").select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti").count()

    def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    println(s"""{"metric":"skew_winnow","sf":"$sfDir","mult":$mult,"n_docs":$nDocs,"hot_fp_df":$hotTop,"probe_raw_sec":${ms(rawSec)},"probe_df_sec":${ms(dfSec)},"unflagged_copies":$unflagged}""")
    spark.stop()
  }
}
