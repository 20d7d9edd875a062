package graft

import org.apache.spark.sql.functions._

/** Adversarial-skew rehearsal for the inverted-index family (round 12,
  * verdict #5): a Zipf-head STOP WORD — planted by appending it to EVERY
  * document several times — gives one term hash whose posting list is
  * exactly corpus-sized (df = n_docs), the worst single-key distribution
  * the q375 build, q376 probe and q377 maintenance can meet.
  *
  * Why each leg survives it by construction:
  *  - BUILD groups on (th, doc_id) — the hot term contributes n_docs
  *    DISTINCT keys, not one hot key, so the hash aggregate spreads it
  *    across every partition; cost stays token-mass-linear.
  *  - PROBE (q376 deliberately probes the highest-df terms, i.e. the
  *    planted one) joins 3 posting lists and aggregates per doc_id — the
  *    join key th is hot (3 keys carry everything), but the downstream
  *    groupBy(doc_id) is high-NDV; the hot-key fan-out is Σ df of the
  *    probed terms, which IS the declared work of scoring those terms.
  *    AQE's OptimizeSkewedJoin splits the 3 hot join keys at runtime.
  *  - MAINTAIN merges a batch's postings by union — append-shaped, no
  *    join on th at all; the hot term only adds batch-count rows.
  *
  * Invariants asserted under skew (correctness, not just time): the hot
  * term's df equals n_docs exactly (a lost hot-posting row means the
  * admission df undercounts — the failure mode this rehearsal exists to
  * catch), and its token mass equals reps·n_docs.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        SPARK_GRAFT_SKEW_MULT=4 sbt "runMain graft.SkewBenchIndex"
  */
object SkewBenchIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SKEW_MULT", "1").toInt
    val reps = 3
    val spark = graft.core.SparkConfigs.localSession("graft-skewbench-index", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val stop = "zzstopword"
    val corpus = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select(
        (col("doc_id") + col("rep") * 100000000L).as("doc_id"),
        concat(col("text"), lit((" " + stop) * reps)).as("text"))
    corpus.groupBy().count().collect() // warm scan/codegen
    val nDocs = corpus.count()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // BUILD: the q375 postings shape over the stop-worded corpus
    var idx: org.apache.spark.sql.DataFrame = null
    val buildSec = time {
      idx = graft.operators.TextAnalysis.invIndexOf(corpus)
        .localCheckpoint() // rehearsal-sized postings (bench harness)
    }

    // hot-term audit: df must be EXACTLY n_docs, mass exactly reps·n_docs
    val hotTh = idx.groupBy(col("th")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("th").asc).limit(1)
      .collect()(0) // 1-row argmax (bench harness)
    val hotDf = hotTh.getLong(1)
    val hotMass = idx.filter(col("th") === hotTh.getLong(0))
      .agg(expr("cast(sum(tf) as bigint)")).collect()(0).getLong(0)

    // PROBE: the q376 shape — top-3 df terms (incl. the planted one),
    // TF-IDF scoring aggregated per doc
    val probeSec = time {
      val terms = idx.groupBy(col("th")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("th").asc).limit(3)
      idx.join(broadcast(terms), "th")
        .groupBy(col("doc_id"))
        .agg(expr("cast(sum(tf * df) as bigint)").as("s"))
        .orderBy(col("s").desc, col("doc_id").asc).limit(10)
        .write.mode("overwrite").format("noop").save()
    }

    // MAINTAIN: the q377 shape — union-merge a 100-doc batch (every batch
    // doc also carries the stop word) + the delta rollup
    val maintainSec = time {
      val batch = corpus.filter(col("doc_id") < 100)
        .select((col("doc_id") + 500000000L).as("doc_id"), col("text"))
      val bp = graft.operators.TextAnalysis.invIndexOf(batch)
      idx.unionByName(bp)
        .agg(count(lit(1)), expr("cast(sum(tf) as bigint)"))
        .write.mode("overwrite").format("noop").save()
    }

    require(hotDf == nDocs,
      s"hot posting list lost rows: df=$hotDf, expected $nDocs")
    require(hotMass == reps * nDocs,
      s"hot token mass wrong: $hotMass, expected ${reps * nDocs}")

    def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    println(s"""{"metric":"skew_index","sf":"$sfDir","mult":$mult,"n_docs":$nDocs,"hot_df":$hotDf,"build_sec":${ms(buildSec)},"probe_sec":${ms(probeSec)},"maintain_sec":${ms(maintainSec)}}""")
    spark.stop()
  }
}
