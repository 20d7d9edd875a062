package graft

import org.apache.spark.sql.functions._

/** Adversarial-skew rehearsal for the q342 sequence-packing prefix-sum
  * (round 11; the round-10 verdict's item 5): the two-phase bucket form
  * claims no single-task window ever sees the corpus — this harness
  * plants the two distributions that could break that claim and measures
  * both, with a planted correctness invariant so a lost-row bug cannot
  * hide behind a fast time.
  *
  * Planted cases against the SAME `Sampling.tokenPrefixSum` code path
  * q342 ships:
  *  - UNIFORM (the shipped shape): bucket = top-20-bits of an md5 hash —
  *    rows spread over ~2^20 buckets, every bucket-local window tiny;
  *  - TOKEN-MASS SKEW: documents whose hash lands in ONE bucket get
  *    1000× the token count, so that single bucket holds most of the
  *    corpus token MASS. The prefix-sum's window cost is row-count-, not
  *    token-mass-proportional, so this must NOT slow the two-phase form
  *    — the rehearsal proves token mass is a non-factor;
  *  - ROW-COUNT SKEW (worst case): every row forced into bucket 0 — the
  *    bucket-local window degenerates into exactly the single-task
  *    global window the two-phase form exists to avoid. Measured as the
  *    documented upper bound; unreachable in production because bucket
  *    is a hash of doc_id, not a data column an adversary controls.
  *
  * Invariant under every distribution: max(cum) == Σ n_tok (no token
  * lost or double-counted) and every st == cum − n_tok — checked
  * exactly, so hot-bucket row loss is a failure, not a straggler.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        SPARK_GRAFT_SKEW_MULT=8 sbt "runMain graft.SkewBenchPacking"
  */
object SkewBenchPacking {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SKEW_MULT", "1").toInt
    val spark = graft.core.SparkConfigs.localSession("graft-skewbench-packing", cpus)
    spark.sparkContext.setLogLevel("WARN")

    // replicated corpus with real token counts, hashed like q342
    val base = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select((col("doc_id") + col("rep") * 100000000L).as("doc_id"),
        col("n_tok"))
      .withColumn("h", expr(
        """CAST(conv(substring(md5(concat('pk#', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"""))
      .localCheckpoint() // rehearsal-sized (bench harness): 3 longs/row
    val nDocs = base.count()

    val uniform = base.withColumn("bucket", expr("h div 1099511627776"))
    // one document carries 1 000 000x its token count — its bucket now
    // holds (far) more than the whole rest of the corpus's token MASS,
    // while row counts stay unchanged: the prefix-sum's window cost is
    // row-proportional, so this must not move the needle
    val massSkew = uniform.withColumn("n_tok",
      expr("CASE WHEN doc_id = 0 THEN n_tok * 1000000 ELSE n_tok END"))
    // every row in one bucket — the degenerate single-window worst case
    val rowSkew = base.withColumn("bucket", lit(0L))

    def run(df: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val prefixed = graft.operators.Sampling.tokenPrefixSum(df)
      val chk = prefixed.agg(
        expr("cast(max(cum) as bigint)").as("max_cum"),
        expr("cast(sum(n_tok) as bigint)").as("tot"),
        expr("cast(sum(CASE WHEN st <> cum - n_tok THEN 1 ELSE 0 END) as bigint)").as("bad"))
        .collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      require(chk.getLong(0) == chk.getLong(1),
        s"prefix-sum lost tokens: max_cum=${chk.getLong(0)} tot=${chk.getLong(1)}")
      require(chk.getLong(2) == 0L, s"${chk.getLong(2)} rows with st != cum - n_tok")
      (sec, chk.getLong(1))
    }

    run(uniform) // warm-up: codegen + shuffle paths, untimed
    val (uSec, uTot) = run(uniform)
    val (mSec, mTot) = run(massSkew)
    val (rSec, _) = run(rowSkew)

    def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    println(s"""{"metric":"skew_packing","sf":"$sfDir","mult":$mult,"n_docs":$nDocs,"tokens_uniform":$uTot,"tokens_mass_skew":$mTot,"uniform_sec":${ms(uSec)},"mass_skew_sec":${ms(mSec)},"row_skew_sec":${ms(rSec)}}""")
    spark.stop()
  }
}
