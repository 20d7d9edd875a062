package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan and wall time for the named
  * queries (all queries if none named). Usage:
  *   sbt "runMain graft.Explain q35_similarity_ann_lsh [more...]"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS.
  */
object Explain {

  /** Per-table file-scan counts over the whole physical plan, descending
    * into broadcast/scalar subqueries, and expanding each DISTINCT cached
    * relation once (its build cost is paid once at runtime). A fact table
    * appearing more than ~3× in one plan means some branch forks the
    * lineage back to the raw scan — the q150 bug class from round 4.
    */
  def scanCounts(df: org.apache.spark.sql.DataFrame): Map[String, Int] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val seen = scala.collection.mutable.Set.empty[Int]
    def walk(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: InMemoryTableScanExec =>
        if (seen.add(System.identityHashCode(s.relation.cacheBuilder)))
          walk(s.relation.cachedPlan)
        else Nil
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.headOption
          .map(p => p.getName.stripSuffix(".parquet")).toSeq
      case other => (other.children ++ other.subqueries).flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  /** Shuffle-exchange count over the whole physical plan (subqueries and
    * cached-relation builds included, each cache expanded once) — the
    * per-query "how many times does data move" number for scale audits.
    * Each DISTINCT exchange counts once: `ReusedExchangeExec` edges are
    * followed (an exchange only reachable through a reuse reference still
    * moves data once) but identity-deduped, so original + reuse never
    * double-count and an exchange's upstream is walked exactly once.
    */
  def exchangeCount(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    val seen = scala.collection.mutable.Set.empty[Int]
    val seenEx = scala.collection.mutable.Set.empty[Int]
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: InMemoryTableScanExec =>
        if (seen.add(System.identityHashCode(s.relation.cacheBuilder)))
          walk(s.relation.cachedPlan)
        else 0
      case r: ReusedExchangeExec => walk(r.child)
      case e: ShuffleExchangeLike =>
        if (seenEx.add(System.identityHashCode(e)))
          1 + (e.children ++ e.subqueries).map(walk).sum
        else 0
      case other => (other.children ++ other.subqueries).map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val auditOnly = args.headOption.contains("--scan-audit")
    val qargs = if (auditOnly) args.drop(1).toSeq else args.toSeq
    val spark = graft.core.SparkConfigs.localSession("graft-explain", cpus)
    spark.sparkContext.setLogLevel("WARN")
    val names = if (qargs.nonEmpty) qargs else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val scans = scanCounts(df).toSeq.sortBy(-_._2)
        .map { case (t, n) => s"$t×$n" }.mkString(", ")
      if (auditOnly) {
        println(s"[scan-audit] $name: $scans; exchanges=${exchangeCount(df)}")
      } else {
        println(s"\n========== $name ==========")
        df.explain("formatted")
        println(s"[scan-audit] $name: $scans; exchanges=${exchangeCount(df)}")
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"[explain] $name took ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
