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

  test("q259: empty and inverted intervals match nothing (no phantom buckets)") {
    import spark.implicits._
    val a = Seq((1L, 0L, 100L, 100L), (2L, 0L, 300L, 200L), (3L, 0L, 50L, 60L))
      .toDF("aid", "k", "alo", "ahi") // empty, inverted, valid
    val b = Seq((10L, 0L, 0L, 1000L)).toDF("bid", "k", "blo", "bhi")
    val out = Temporal.intervalOverlapJoin(a, b, "k", "alo", "ahi", "blo", "bhi", 75L)
      .select("aid").collect().map(_.getLong(0)).toSet
    assert(out == Set(3L), "only the valid interval may match")
  }

  test("q259 plan: overlap join is an equi-join on the bucket, not a nested loop") {
    val plan = Temporal.q259IntervalOverlap(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  // ------------------------------------------------------------- q260
  test("q260: integer-numerator D equals the brute-force KS statistic") {
    import graft.sources.Tables
    val samples = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_type"), expr("cast(round(value * 100) as bigint)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val s1 = samples.filter(_._1 == "view").map(_._2).sorted
    val s2 = samples.filter(_._1 == "purchase").map(_._2).sorted
    val support = (s1 ++ s2).distinct.sorted
    val dNum = support.map { v =>
      val c1 = s1.count(_ <= v).toLong; val c2 = s2.count(_ <= v).toLong
      math.abs(c1 * s2.length - c2 * s1.length)
    }.max
    val row = EventAnalytics.q260KsTest(spark, sf).collect()(0)
    assert(row.getAs[Long]("n1") == s1.length.toLong)
    assert(row.getAs[Long]("n2") == s2.length.toLong)
    assert(row.getAs[Long]("d_num") == dNum)
    // the exact-decimal rejection agrees with the double-precision check
    // at this scale (the decimal form exists for the scales where it won't)
    val dStat = dNum.toDouble / (s1.length.toDouble * s2.length.toDouble)
    val thresh = 1.358 * math.sqrt((s1.length + s2.length).toDouble /
      (s1.length.toDouble * s2.length))
    assert(row.getAs[Boolean]("reject_05") == dStat > thresh)
  }

  // ------------------------------------------------------------- q261
  test("q261: every 3-gram-sharing pair is classified, both kinds present") {
    val out = Sampling.q261SplitContamination(spark, sf).collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[Long]("n_pairs")).toMap
    assert(out.keySet == Set("contained", "crossing"))
    // total classified pairs == unthresholded 3-gram-sharing pair count
    val corpus = Dedup.q97Corpus(spark, sf)
    val sh = Dedup.shingles3(corpus)
    val allPairs = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    assert(out.values.sum == allPairs)
  }

  // ------------------------------------------------------------- q262
  test("q262: credit mass equals purchase revenue exactly (micro-cents)") {
    import graft.sources.Tables
    val rows = EventAnalytics.q262PositionAttribution(spark, sf).collect()
    val credited = rows.map(_.getAs[Long]("credit_micro_cents")).sum
    val revenue = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .agg(expr("cast(sum(cast(round(value * 100) as bigint)) as bigint)"))
      .collect()(0).getLong(0)
    assert(credited == revenue * 1000000L,
      s"credit mass $credited != revenue*1e6 ${revenue * 1000000L}")
    // all three touch channels plus direct must appear at this SF
    assert(rows.map(_.getAs[String]("channel")).toSet.subsetOf(
      Set("view", "click", "direct")))
  }

  // ------------------------------------------------------------- q263
  test("q263: per-lang duplicate counts equal the planted copies") {
    import graft.sources.Tables
    val planted = Tables.documents(spark, sf).filter(col("doc_id") < 40)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Dedup.q263DedupSavings(spark, sf).collect()
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      assert(r.getAs[Long]("n_docs") - r.getAs[Long]("n_unique_texts") ==
        planted.getOrElse(lang, 0L),
        s"$lang: duplicate mass must equal the planted copies")
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count() + 40)
  }

  // ------------------------------------------------------------- q264
  test("q264: median-of-slopes equals the brute-force Theil-Sen estimate") {
    import graft.sources.Tables
    val daily = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .groupBy(expr("datediff(date_trunc('DAY', ts), DATE '2024-01-01')").as("day"))
      .agg(expr("cast(sum(cast(round(value * 100) as bigint)) as bigint)").as("rc"))
      .collect().map(r => (r.getAs[Int]("day").toLong, r.getAs[Long]("rc")))
    val slopes = (for {
      (d1, c1) <- daily; (d2, c2) <- daily if d1 < d2
    } yield ((c2 - c1).toDouble / (d2 - d1).toDouble, c2 - c1, d2 - d1, d1, d2))
      .sortBy(t => (t._1, t._2, t._3, t._4, t._5))
    val np = slopes.length
    val med =
      if (np % 2 == 1) slopes((np + 1) / 2 - 1)._1
      else (slopes(np / 2 - 1)._1 + slopes(np / 2)._1) / 2.0
    val row = EventAnalytics.q264TheilSen(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_pairs") == np.toLong)
    assert(row.getAs[Double]("ts_slope") ==
      BigDecimal(med / 100.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ------------------------------------------------------------- q265
  test("q265: streamed windowed top-k equals the batch twin") {
    import graft.sources.Tables
    val w = Window.partitionBy(col("ws")).orderBy(col("n").desc, col("event_type").asc)
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "6 hours").getField("start").as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .orderBy(col("ws"), col("rk"))
      .collect().map(_.toString)
    val streamed = graft.streaming.StreamingOps.q265StreamWindowTopk(spark, sf)
      .collect().map(_.toString)
    assert(streamed.toSeq == batch.toSeq)
  }

  // ------------------------------------------------------------- q266
  test("q266: slope/r2 match a brute-force regression on the quantized lns") {
    import graft.sources.Tables
    val hist = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .collect().map(_.getAs[Long]("n"))
    val pts = hist.zipWithIndex.map { case (n, i) =>
      (math.round(math.log(i + 1.0) * 1e6), math.round(math.log(n.toDouble) * 1e6))
    }
    val m = pts.length.toDouble
    val sx = pts.map(_._1.toDouble).sum; val sy = pts.map(_._2.toDouble).sum
    val sxx = pts.map(p => p._1.toDouble * p._1).sum
    val sxy = pts.map(p => p._1.toDouble * p._2).sum
    val slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    val row = TextAnalysis.q266ZipfSlope(spark, sf).collect()(0)
    assert(row.getAs[Long]("vocab_size") == pts.length.toLong)
    assert(math.abs(row.getAs[Double]("zipf_slope") - slope) < 1e-4)
    val r2 = row.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
  }

  // ------------------------------------------------------------- q267
  test("q267: induced stopwords are exactly the >=60%-df tokens") {
    import graft.sources.Tables
    val nDocs = Tables.documents(spark, sf).count()
    val rows = TextAnalysis.q267StopwordInduction(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("df") * 100 >= nDocs * 60))
    // df counts PRESENCE, never occurrences: df can't exceed the doc count
    rows.foreach(r => assert(r.getAs[Long]("df") <= nDocs))
  }

  // ------------------------------------------------------------- q268
  test("q268: A-ES selection equals the brute-force priority top-k") {
    import graft.sources.Tables
    import java.security.MessageDigest
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderkey"), expr("cast(round(o_totalprice * 100) as bigint)").as("wc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def priorityNano(id: Long, wc: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      math.round(math.log(u) / (wc.toDouble / 100.0) * 1e9)
    }
    val top = rows.map { case (id, wc) => (priorityNano(id, wc), id, wc) }
      .sortBy(t => (-t._1, t._2)).take(Sampling.ReservoirK)
    val row = Sampling.q268WeightedReservoir(spark, sf).collect()(0)
    assert(row.getAs[Long]("k") == Sampling.ReservoirK.toLong)
    assert(row.getAs[Long]("sample_cents") == top.map(_._3).sum)
    assert(row.getAs[Long]("min_priority_nano") == top.map(_._1).min)
    // the reason to weight: heavier rows enter at a higher rate
    assert(row.getAs[Double]("sample_avg") > row.getAs[Double]("corpus_avg"))
  }

  // ------------------------------------------------------------- q269
  test("q269: span arithmetic is consistent and the longest gap is real") {
    import graft.sources.Tables
    val row = EventAnalytics.q269OutageReport(spark, sf).collect()(0)
    val span = row.getAs[Long]("n_minutes_span")
    val obs = row.getAs[Long]("n_observed")
    val miss = row.getAs[Long]("n_missing")
    assert(span == obs + miss, "observed + missing must tile the span exactly")
    // brute-force the longest silence from the distinct observed minutes
    val minutes = Tables.events(spark, sf)
      .select(date_trunc("MINUTE", col("ts")).as("m")).distinct()
      .orderBy(col("m")).collect().map(_.getTimestamp(0).getTime / 60000L)
    val longest = minutes.sliding(2).map { case Array(a, b) => b - a - 1 }.max
    assert(row.getAs[Long]("longest_gap_min") == longest)
    assert(obs == minutes.length.toLong)
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
      Temporal.q259IntervalOverlap _, EventAnalytics.q260KsTest _,
      Sampling.q261SplitContamination _, EventAnalytics.q262PositionAttribution _,
      Dedup.q263DedupSavings _, EventAnalytics.q264TheilSen _,
      TextAnalysis.q266ZipfSlope _, TextAnalysis.q267StopwordInduction _,
      Sampling.q268WeightedReservoir _, EventAnalytics.q269OutageReport _)) {
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
