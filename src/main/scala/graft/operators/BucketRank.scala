package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Two-phase "bucket rank" selection — the scale-safe replacement for a
  * ranking window partitioned by a LOW-cardinality key (SCALE.md "Top-k
  * and windows"). A plain `row_number() OVER (PARTITION BY g ORDER BY v)`
  * on a 3-value `g` serializes each group into one task: at 100 TB the
  * whole corpus sorts in 3 tasks. This helper computes the SAME selected
  * rows in three fully parallel steps:
  *
  *   1. fixed-width value buckets: per-(group, bucket) row counts — an
  *      ordinary partial+final hash aggregate, parallel at any scale;
  *   2. the tiny (groups × buckets) count frame rolls into per-bucket
  *      rank offsets and group totals (windows over the aggregate, not
  *      the corpus), and the buckets that CONTAIN a requested rank are
  *      identified arithmetically — typically 1-2 buckets per group;
  *   3. only the rows of hit buckets are ranked, with the window
  *      partitioned by (group, bucket): the sorted span is one bucket
  *      (~1/buckets of a group), never a whole group. Global rank =
  *      bucket offset + local rank.
  *
  * Equality with the plain-window form is proven per call site in
  * Round6Spec; the q134 equi-depth binning operator is the original
  * instance of the pattern.
  */
object BucketRank {

  /** Rows of `x` whose global rank within `group` — ordering by `ord`
    * (value first, then a total-order tiebreak) — equals one of the
    * `targets` rank expressions. `bucket` must be a monotone function of
    * the first `ord` column (fixed-width `floor(v / W)` is the usual
    * choice); `targets` are integer Columns over the group-size column
    * `__n` (e.g. `expr("(__n + 1) div 2")`). Output: the selected rows of
    * `x` plus `__grank` (the global rank) and `__n` (the group size).
    */
  def select(x: DataFrame, group: String, bucket: Column, ord: Seq[Column],
             targets: Seq[Column]): DataFrame = {
    val g = col(group)
    val withB = x.withColumn("__b", bucket)
    val counts = withB.groupBy(g, col("__b")).agg(count(lit(1)).as("__cnt"))
    val off = counts
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(Window.partitionBy(g).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(Window.partitionBy(g)))
    // a bucket is "hit" when some requested rank k lands inside it:
    // __off < k <= __off + __cnt
    val hit = off
      .filter(targets.map(k =>
        col("__off") < k.cast("long") && k.cast("long") <= col("__off") + col("__cnt"))
        .reduce(_ || _))
      .select(g, col("__b"), col("__off"), col("__n"))
    val wLocal = Window.partitionBy(g, col("__b")).orderBy(ord: _*)
    withB.join(broadcast(hit), Seq(group, "__b"))
      .withColumn("__grank", col("__off") + row_number().over(wLocal).cast("long"))
      .filter(targets.map(k => col("__grank") === k.cast("long")).reduce(_ || _))
      .drop("__b", "__off")
  }
}
