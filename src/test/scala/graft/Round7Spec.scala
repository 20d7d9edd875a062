package graft

import graft.operators._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 additions: group-aware folds (q255), largest-remainder quotas
  * (q256), vocabulary coverage (q257), the late-arrival audit's two-phase
  * prefix-max (q258), and the interval-overlap join (q259). Each operator
  * gets its semantic property test (differential against a brute-force or
  * single-window formulation where one exists) plus the plan shape that
  * makes it survive scale.
  */
class Round7Spec extends SparkSuite {

  private val sf01 = "/root/testdata/sf0.01"

  // ------------------------------------------------------------- q255
  test("q255: folds partition the corpus and no cluster straddles folds") {
    val labels = Dedup.nearDupClusterTable(spark, sf)
      .withColumn("fold", pmod(col("component"), lit(Sampling.KFolds.toLong)))
    // every cluster maps to exactly one fold — the group-aware guarantee
    val straddlers = labels.groupBy(col("component"))
      .agg(countDistinct(col("fold")).as("nf"))
      .filter(col("nf") > 1).count()
    assert(straddlers == 0L)
    // the readout's doc total equals the cluster table's row count
    val out = Sampling.q255FoldAssignment(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == labels.count())
    // the counterfactual must be non-degenerate: the per-doc hash fold
    // DOES tear some multi-doc clusters (else the column certifies nothing)
    assert(out.map(_.getAs[Long]("naive_leaky_clusters")).sum > 0L)
  }

  // ------------------------------------------------------------- q256
  test("q256: quotas sum to exactly N and each is floor or floor+1") {
    val rows = Sampling.q256QuotaAllocation(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("quota")).sum == Sampling.QuotaTotal)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    rows.foreach { r =>
      val ideal = Sampling.QuotaTotal * r.getAs[Long]("n_docs")
      val base = ideal / total
      val q = r.getAs[Long]("quota")
      assert(q == base || q == base + 1,
        s"quota $q outside {floor, floor+1} of ${ideal.toDouble / total}")
    }
  }

  // ------------------------------------------------------------- q257
  test("q257: coverage ranks are minimal and monotone") {
    val rows = TextAnalysis.q257VocabCoverage(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("pct")).toSeq == TextAnalysis.CoverageTargets)
    val sizes = rows.map(_.getAs[Long]("vocab_size"))
    assert(sizes.sameElements(sizes.sorted), "vocab_size must be monotone in pct")
    // recompute the exact cumulative histogram and check minimality:
    // rank vocab_size reaches the target, rank vocab_size-1 does not
    val hist = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .collect().map(_.getAs[Long]("n"))
    val totalTokens = hist.sum
    val cum = hist.scanLeft(0L)(_ + _).drop(1) // cum(i) = tokens in top-(i+1)
    rows.foreach { r =>
      val pct = r.getAs[Int]("pct"); val k = r.getAs[Long]("vocab_size").toInt
      assert(r.getAs[Long]("total_tokens") == totalTokens)
      assert(r.getAs[Long]("tokens_covered") == cum(k - 1))
      assert(100L * cum(k - 1) >= pct.toLong * totalTokens)
      if (k > 1) assert(100L * cum(k - 2) < pct.toLong * totalTokens,
        s"pct=$pct: rank ${k - 1} already covers — $k is not minimal")
    }
  }

  // ------------------------------------------------------------- q258
  test("q258: two-phase prefix-max equals the single-window formulation") {
    import graft.sources.Tables
    val ev = Tables.events(spark, sf).select(
      col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus"),
      date_trunc("MINUTE", col("ts")).as("mb"))
    val naive = ev
      .withColumn("hwm", max(col("tus")).over(
        Window.orderBy(col("mb"), col("user_id"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("late_us", greatest(lit(0L),
        when(col("hwm").isNull, lit(0L)).otherwise(col("hwm") - col("tus"))))
    val expected = EventAnalytics.LateDelaysSec.map { d =>
      naive.agg(count_if(col("late_us") > lit(d.toLong * 1000000L))).collect()(0).getLong(0)
    }
    val got = EventAnalytics.q258LateArrivalAudit(spark, sf).collect()
      .map(_.getAs[Long]("n_dropped")).toSeq
    assert(got == expected)
  }

  test("q258 plan: no global single-partition window touches the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Aggregate}
    val plan = EventAnalytics.q258LateArrivalAudit(spark, sf01)
      .queryExecution.optimizedPlan
    val offending = plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        !w.child.collect { case a: Aggregate => a }.exists(_ => true) => w
    }
    assert(offending.isEmpty,
      "every unpartitioned window must sit over an aggregate, not the corpus")
  }

  // ------------------------------------------------------------- q259
  test("q259: randomized differential vs brute-force interval overlap") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val a = (1 to 120).map { i =>
        val lo = rnd.nextInt(2000).toLong
        (i.toLong, rnd.nextInt(5).toLong, lo, lo + 1 + rnd.nextInt(400))
      }
      val b = (1 to 120).map { i =>
        val lo = rnd.nextInt(2000).toLong
        (i.toLong + 1000, rnd.nextInt(5).toLong, lo, lo + 1 + rnd.nextInt(400))
      }
      val expected = (for {
        (ai, ak, alo, ahi) <- a
        (bi, bk, blo, bhi) <- b
        if ak == bk && alo < bhi && blo < ahi
      } yield (ai, bi)).toSet
      import spark.implicits._
      val out = Temporal.intervalOverlapJoin(
          a.toDF("aid", "k", "alo", "ahi"), b.toDF("bid", "k", "blo", "bhi"),
          "k", "alo", "ahi", "blo", "bhi", bucketWidth = 150L)
        .select(col("aid"), col("bid")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(out.length == out.toSet.size, s"trial $trial: duplicate pairs emitted")
      assert(out.toSet == expected, s"trial $trial mismatch")
    }
  }

  test("q259 plan: overlap join is an equi-join on the bucket, not a nested loop") {
    val plan = Temporal.q259IntervalOverlap(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  // ------------------------------------------------------------- determinism
  test("round-7 additions are bit-identical at 2 vs 32 shuffle partitions") {
    def run(q: (org.apache.spark.sql.SparkSession, String) => DataFrame): Seq[String] = {
      Seq("2", "32").map { p =>
        withShufflePartitions(p) {
          q(spark, sf).collect().map(_.toString).mkString("|")
        }
      }
    }
    for (q <- Seq(
      Sampling.q255FoldAssignment _, Sampling.q256QuotaAllocation _,
      TextAnalysis.q257VocabCoverage _, EventAnalytics.q258LateArrivalAudit _,
      Temporal.q259IntervalOverlap _)) {
      val Seq(a, b) = run(q)
      assert(a == b)
    }
  }

  private def withShufflePartitions[T](n: String)(body: => T): T = {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }
}
