package graft

import org.apache.spark.sql.functions._

/** Adversarial-skew rehearsal for the substring-dedup path (round 9,
  * verdict item 4): q270/q283's [[graft.operators.Dedup.substringDupCoverage]]
  * was the one candidate generator that had not been through the SkewBench
  * treatment. The hot-key case is a BOILERPLATE K-gram shared by every
  * document — a site footer, a license header — which q270's fixture
  * (every 20th doc) never stresses: here the 12-token span is appended to
  * EVERY doc, so each of its 5 K-grams occurs n_docs times and the
  * gram-keyed shuffles see a key that is a constant fraction of the corpus.
  *
  * What the shape analysis predicts (and this rehearsal measures):
  *  - the gdf aggregate is SAFE by construction: countDistinct plans as
  *    distinct-by-(gk, doc_id) (spread fine) then a partial-combined count
  *    by gk — each upstream task emits ONE partial row per gram, so the
  *    hot gram reduces to ~#partitions rows before its exchange;
  *  - the exposure is the cov JOIN-BACK (grams ⋈ cross-doc grams on gk):
  *    a sort-merge join keyed on gk lands every occurrence of the hot
  *    gram in one task unless AQE's OptimizeSkewedJoin splits it. This
  *    rehearsal runs with AQE on (the repo default) and reports wall time
  *    plus the planted-coverage invariant (every doc must report covered
  *    ≥ 12 — the shared span — so a silently dropped hot partition is a
  *    correctness failure here, not just a slow task).
  *
  * SPARK_GRAFT_SKEW_MULT=R replicates the corpus R× (distinct doc ids) to
  * scan the hot-gram row count toward the 96 M-row scale the round-7
  * sessionize rehearsal used.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.SkewBenchSubstring"
  */
object SkewBenchSubstring {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SKEW_MULT", "1").toInt
    val spark = graft.core.SparkConfigs.localSession("graft-skewbench-substr", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val span = graft.operators.Dedup.Q270Span
    val k = graft.operators.Dedup.Q270K
    val hot = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select(
        (col("doc_id") + col("rep") * 100000000L).as("doc_id"),
        concat(col("text"), lit(" " + span)).as("text"))

    // warm scan/codegen so the timed pass is not charged for startup
    hot.groupBy().count().collect()
    val nDocs = hot.count()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val covSec = time(
      graft.operators.Dedup.substringDupCoverage(hot, k)
        .write.mode("overwrite").format("noop").save())

    // correctness under skew: every doc carries the shared 12-token span,
    // so every doc must report covered >= 12 — a doc below that means the
    // hot gram's rows were lost, not merely slow
    val bad = graft.operators.Dedup.substringDupCoverage(hot, k)
      .filter(col("covered") < 12).count()
    // ~5 hot-gram occurrences per doc (the span's K-windows)
    val hotRows = nDocs * (span.split(" ").length - k + 1)

    def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    println(s"""{"metric":"skew_substring","sf":"$sfDir","mult":$mult,"n_docs":$nDocs,"hot_gram_rows":$hotRows,"cov_sec":${ms(covSec)},"under_covered_docs":$bad}""")
    spark.stop()
  }
}
