package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adversarial-skew rehearsal for sessionization (round 7, verdict item 7):
  * reassigns 50% of sf0.1's events to ONE user — the "a user is half the
  * corpus" shape that serializes a plain per-user window into a single
  * task and that no AQE rule can split — then times the plain
  * single-window sessionize against
  * [[graft.operators.EventAnalytics.sessionizeSkewSafe]] (time-range
  * decomposition) on identical input, checks the per-user rollups agree,
  * and prints one JSON line. The measured ratio goes to SCALE.md: the
  * escape hatch's value as a number, not an argument.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.SkewBench"
  */
object SkewBench {

  private def plainSessionize(ev: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    ev.withColumn("prev_t", lag(col("t"), 1).over(w))
      .withColumn("is_start",
        (col("prev_t").isNull || col("t") - col("prev_t") > gapUs).cast("long"))
      .withColumn("session_id",
        sum(col("is_start")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("prev_t", "is_start")
  }

  private def rollup(s: DataFrame): DataFrame =
    s.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"),
        expr("cast(sum(n) as bigint)").as("n_events"),
        max(col("n")).as("max_session_events"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.SparkConfigs.localSession("graft-skewbench", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val gapUs = graft.operators.EventAnalytics.Q225GapUs
    val bucketUs = graft.operators.EventAnalytics.Q225BucketUs
    // SPARK_GRAFT_SKEW_MULT=R inflates the corpus R× (distinct event ids,
    // jittered timestamps) to scan for the crossover where the hot task's
    // serialized sort starts to dominate
    val mult = sys.env.getOrElse("SPARK_GRAFT_SKEW_MULT", "1").toInt
    // one user absorbs every even event_id = 50% of the corpus
    val hot = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)").as("t"), col("event_id"))
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select(
        when(col("event_id") % 2 === 0, lit(1L))
          .otherwise(col("user_id") + col("rep") * 100000000L).as("user_id"),
        (col("t") + col("rep")).as("t"),
        (col("event_id") * mult + col("rep")).as("event_id"))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm the scan/codegen paths so neither side is charged for startup
    hot.groupBy().count().collect()

    val plainSec = time(
      rollup(plainSessionize(hot, gapUs))
        .write.mode("overwrite").format("noop").save())
    val safeSec = time(
      rollup(graft.operators.EventAnalytics.sessionizeSkewSafe(hot, gapUs, bucketUs))
        .write.mode("overwrite").format("noop").save())

    // equality check on the rollups — the decomposition must change the
    // plan, not the answer (Round6Spec proves it on fixtures; this proves
    // it on the adversarial corpus itself)
    val diff = rollup(plainSessionize(hot, gapUs))
      .unionByName(rollup(
        graft.operators.EventAnalytics.sessionizeSkewSafe(hot, gapUs, bucketUs)))
      .groupBy(col("user_id"), col("n_sessions"), col("n_events"),
        col("max_session_events"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 2)
      .count()

    def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    println(s"""{"metric":"skew_sessionize","sf":"$sfDir","plain_sec":${ms(plainSec)},"skewsafe_sec":${ms(safeSec)},"speedup":${ms(plainSec / safeSec)},"rollup_mismatches":$diff}""")
    spark.stop()
  }
}
