package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Derived-artifact persistence — the round-7 closure of the "rebuilt per
  * run" weak family: expensive derived tables (near-dup cluster labels,
  * trained IVF centroids + inverted lists, the bigram-LM model) are built
  * ONCE per (session, source dir) as managed warehouse tables and PROBED by
  * the driven queries, exactly as a 100 TB deployment would persist them at
  * ingest time (the q212 bucketed-layout pattern generalized).
  *
  * Contract:
  *  - [[buildOrGet]] returns the stored table, building it only on first
  *    touch in this session. The build cost is paid once and amortized over
  *    every later probe (warm bench passes included) — the actual contract
  *    of an index/model artifact at scale.
  *  - [[rebuild]] force-drops and rebuilds — the driven `qNNN_build_*`
  *    queries use it so the BUILD cost stays a measured, oracle-checked
  *    number instead of disappearing into the first probe.
  *  - Table names embed an md5 digest of the source dir (not 32-bit
  *    hashCode — two dirs must never collide into a stale layout).
  *    Regenerating data under the SAME dir within one session still
  *    requires a [[rebuild]]: the artifact is keyed on path, not content.
  */
object Artifacts {

  def tableName(kind: String, d: String): String =
    s"graft_${kind}_${graft.core.Utils.pathDigest(d)}"

  /** The stored artifact table for `kind` over source dir `d`, built via
    * `build` on first touch. `bucket` = (column, numBuckets) pre-shuffles
    * the artifact on its probe key so probe-side joins/aggs on that key
    * skip their exchange (the q101/q212 dividend).
    */
  def buildOrGet(spark: SparkSession, kind: String, d: String,
                 bucket: Option[(String, Int)] = None)
                (build: => DataFrame): DataFrame = {
    val t = tableName(kind, d)
    if (!spark.catalog.tableExists(t)) {
      // a previous JVM may have left the managed location behind while the
      // (in-memory) catalog forgot the table — clear it before the write
      graft.etl.Warehouse.dropManagedTable(spark, t)
      val w = build.write.mode(SaveMode.Overwrite).format("parquet")
      bucket match {
        case Some((c, n)) => w.bucketBy(n, c).sortBy(c).saveAsTable(t)
        case None         => w.saveAsTable(t)
      }
    }
    spark.table(t)
  }

  /** Drop + rebuild unconditionally — the driven build queries' path. */
  def rebuild(spark: SparkSession, kind: String, d: String,
              bucket: Option[(String, Int)] = None)
             (build: => DataFrame): DataFrame = {
    graft.etl.Warehouse.dropManagedTable(spark, tableName(kind, d))
    buildOrGet(spark, kind, d, bucket)(build)
  }
}
