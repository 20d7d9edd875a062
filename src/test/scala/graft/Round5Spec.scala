package graft

import graft.operators._

import org.apache.spark.sql.functions._

/** Round-4 (continued) specs: runtime-filter plan levers (dynamic partition
  * pruning, bloom-filter join pushdown), the TPC-H Q5-shaped star join, and
  * exact-rank winsorization.
  */
class Round5Spec extends SparkSuite {

  test("q129: partitioned scan carries a dynamicpruning partition filter") {
    val df = EtlQueries.q129DynamicPartitionPruning(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a DPP subquery in the partition filters, got:\n${plan.take(2000)}")
    // and the result itself: only the two expedite priorities survive
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1-URGENT", "2-HIGH"))
  }

  test("q130: scoped runtime-filter conf injects might_contain into the probe side") {
    val enabledKey = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val scanKey =
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevEnabled = spark.conf.get(enabledKey)
    val prevScan = spark.conf.get(scanKey)
    val prevBcast = spark.conf.get(bcastKey)
    spark.conf.set(enabledKey, "true")
    spark.conf.set(scanKey, "0")
    spark.conf.set(bcastKey, "-1")
    try {
      val li = graft.sources.Tables.lineitem(spark, sf)
      val o = graft.sources.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.hint("merge")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("might_contain"),
        s"expected an injected bloom filter on the probe side, got:\n${plan.take(2000)}")
    } finally {
      spark.conf.set(enabledKey, prevEnabled)
      spark.conf.set(scanKey, prevScan)
      spark.conf.set(bcastKey, prevBcast)
    }
  }

  test("q130: bloom-filtered join result equals the plain join") {
    val got = EtlQueries.q130BloomFilterJoin(spark, sf).collect()
    val want = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        graft.core.Exact.dsum(col("l_extendedprice")).as("total_price"))
      .orderBy(col("l_returnflag")).collect()
    assert(got.toSeq == want.toSeq)
  }

  test("q131: star join matches the SQL formulation and broadcasts every dim") {
    val df = Relational.q131StarJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    // exactly one shuffle-requiring join edge (lineitem⋈orders) may sort-merge
    assert("SortMergeJoin".r.findAllIn(plan).size <= 1,
      "only the fact-fact edge may shuffle")

    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(t => graft.sources.Tables.table(spark, sf, t).createOrReplaceTempView(s"v_$t"))
    val want = spark.sql(
      """SELECT n_name, count(*) AS n_lineitems,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
         FROM v_customer, v_orders, v_lineitem, v_supplier, v_nation, v_region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name ORDER BY n_name""").collect()
    assert(df.collect().toSeq == want.toSeq)
  }

  test("q132: winsorized sum is bounded by raw sum and clamps < 2.5% of rows") {
    val rows = Relational.q132Winsorize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      val clamped = r.getAs[Long]("n_clamped")
      val p01 = r.getAs[Double]("p01")
      val p99 = r.getAs[Double]("p99")
      assert(p01 <= p99)
      // by construction at most ~1% clamp on each tail
      assert(clamped <= math.ceil(n * 0.025).toLong, s"clamped=$clamped of n=$n")
      assert(clamped > 0, "fixture tails should clamp at least one row")
    }
  }

  test("wordpiece: greedy longest-match, continuation prefixes, UNK dead ends") {
    val vocab = TextAnalysis.WordpieceVocab.toSet
    val maxLen = 6
    assert(TextAnalysis.wordpiece("customer", vocab, maxLen) ==
      Seq("cust", "##omer"))
    assert(TextAnalysis.wordpiece("streaming", vocab, maxLen) ==
      Seq("stream", "##ing"))
    assert(TextAnalysis.wordpiece("the", vocab, maxLen) == Seq("the"))
    // falls back to char-by-char, never UNKs on pure a-z
    assert(TextAnalysis.wordpiece("zzqx", vocab, maxLen) ==
      Seq("z", "##z", "##q", "##x"))
    // digit = dead end = whole-word UNK
    assert(TextAnalysis.wordpiece("spark4me", vocab, maxLen) == Seq("[UNK]"))
  }

  test("q133: organic corpus certified UNK-free, planted rows exact") {
    val rows = TextAnalysis.q133WordpieceTokenize(spark, sf).collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getAs[Boolean]("corpus_unk_free")))
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("tokens")).toMap
    assert(byId(9000001L) == "cust ##omer win ##dow filt ##er")
    assert(byId(9000003L) == "[UNK]")
  }

  test("q134: two-phase ntile equals the single-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val got = Profiling.q134EquidepthBins(spark, sf).collect()
    val want = graft.sources.Tables.orders(spark, sf)
      .select(col("o_totalprice"),
        ntile(Profiling.Q134Tiles)
          .over(Window.orderBy(col("o_totalprice"), col("o_orderkey")))
          .cast("long").as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"),
        graft.core.Exact.dsum(col("o_totalprice")).as("bin_sum"))
      .orderBy(col("decile")).collect()
    assert(got.toSeq == want.toSeq)
  }

  test("q134: result is identical at different parallelism") {
    val a = Profiling.q134EquidepthBins(spark, sf).collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Profiling.q134EquidepthBins(spark, sf).collect().toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("q135: user split is exhaustive, moments match a naive recompute") {
    val r = EventAnalytics.q135AbTest(spark, sf).collect().head
    val users = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("spend"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val (ctrl, treat) = users.partition(_._1 % 2 == 0)
    assert(r.getAs[Long]("n_control") == ctrl.length &&
      r.getAs[Long]("n_treatment") == treat.length)
    def mean(xs: Array[(Long, Long)]) = xs.map(_._2).sum.toDouble / xs.length / 100.0
    assert(math.abs(r.getAs[Double]("mean_control") - mean(ctrl)) < 1e-9)
    assert(math.abs(r.getAs[Double]("mean_treatment") - mean(treat)) < 1e-9)
    assert(!r.getAs[Double]("welch_t").isNaN)
    assert(r.getAs[Double]("var_control") > 0 && r.getAs[Double]("var_treatment") > 0)
  }

  test("q135: bit-identical at different parallelism") {
    val a = EventAnalytics.q135AbTest(spark, sf).collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(EventAnalytics.q135AbTest(spark, sf).collect().toSeq == a)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("q136: transformWithState totals equal the batch aggregate, provider restored") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.get(providerKey)
    val got = graft.streaming.StreamingOps.q136TransformWithState(spark, sf).collect()
    assert(spark.conf.get(providerKey) == before, "conf scope must restore")
    val want = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(expr("cast(round(value * 100) as bigint)")) / 100.0).as("total_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("user_id")).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0) && g.getLong(1) == w.getLong(1))
      assert(g.getDouble(2) == w.getDouble(2) && g.getDouble(3) == w.getDouble(3))
    }
  }

  test("q137: recursive walk matches the closed form on full levels") {
    val rows = Relational.q137RecursiveCte(spark, sf).collect()
    val maxKey = graft.sources.Tables.customer(spark, sf)
      .agg(max(col("c_custkey"))).collect().head.getLong(0)
    // while the level fits under maxKey the tree is complete: 2^d nodes,
    // Σk over level d = Σ(2^d .. 2^(d+1)-1)
    rows.zipWithIndex.takeWhile { case (_, d) => (1L << (d + 1)) - 1 <= maxKey }
      .foreach { case (r, d) =>
        assert(r.getInt(0) == d && r.getLong(1) == (1L << d))
        val lo = 1L << d
        val hi = (1L << (d + 1)) - 1
        assert(r.getLong(2) == (lo + hi) * (hi - lo + 1) / 2)
      }
    assert(rows.length >= 7, "recursion must actually iterate")
  }

  test("q138: correlated LATERAL equals the window-rank formulation") {
    import org.apache.spark.sql.expressions.Window
    val got = Relational.q138LateralTopk(spark, sf).collect()
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = graft.sources.Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("q139: variant extraction equals the schema'd from_json route") {
    val viaVariant = graft.sources.Tables.events(spark, sf)
      .select(expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
      .agg(sum(col("k")), count(col("k"))).collect().head
    val viaSchema = graft.sources.Tables.events(spark, sf)
      .select(get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .agg(sum(col("k")), count(col("k"))).collect().head
    assert(viaVariant == viaSchema)
  }

  test("q140: prefix-filtered join equals the every-shared-word formulation") {
    val docs = graft.sources.Tables.documents(spark, sf).filter(col("doc_id") < 100)
    val got = Dedup.prefixFilterJoin(docs, 0.8)
      .orderBy(col("doc_a"), col("doc_b")).collect()
    val want = Dedup.q33NgramJaccard(spark, sf).collect() // same window, naive join
    assert(got.toSeq == want.toSeq)
  }

  test("q140: prefix postings are a strict subset of full postings") {
    val docs = graft.sources.Tables.documents(spark, sf).filter(col("doc_id") < 100)
    val full = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("word")).count()
    // replicate the prefix stage size: must prune, not just reorder
    val t = 0.8
    val words = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("word"))
    val sizes = words.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val kept = sizes.select(
      sum(expr(s"n - CAST(ceil($t * n) AS BIGINT) + 1"))).collect().head.getLong(0)
    assert(kept < full, s"prefix kept $kept of $full postings")
  }

  test("q141: grid covers every user's span; interpolated rows fill the gaps exactly") {
    val rows = EventAnalytics.q141InterpolateFill(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, known, interp) =
        (r.getAs[Long]("n_hours"), r.getAs[Long]("n_known"), r.getAs[Long]("n_interp"))
      assert(n == known + interp)
      assert(known >= 1)
    }
    // hand-checked miniature: two points, straight line between them
    import spark.implicits._
    val mini = Seq((1L, 0L, 100L), (1L, 4L, 500L)).toDF("user_id", "h", "v")
    // interpolation at h=1,2,3 must be 200,300,400 cents → series (in mc):
    // 100k + 200k + 300k + 400k + 500k = 1500k
    val pts = mini
    val grid = pts.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"), explode(expr("sequence(h0, h1)")).as("h"))
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val series = grid.join(pts, Seq("user_id", "h"), "left")
      .withColumn("hp", max(expr("CASE WHEN v IS NOT NULL THEN h END")).over(wPrev))
      .withColumn("hn", min(expr("CASE WHEN v IS NOT NULL THEN h END")).over(wNext))
      .join(pts.select(col("user_id"), col("h").as("hp"), col("v").as("vp")), Seq("user_id", "hp"))
      .join(pts.select(col("user_id"), col("h").as("hn"), col("v").as("vn")), Seq("user_id", "hn"))
      .withColumn("vmc", expr(
        "CASE WHEN v IS NOT NULL THEN v * 1000 " +
          "ELSE ((vp * (hn - h) + vn * (h - hp)) * 1000) div (hn - hp) END"))
      .orderBy(col("h")).select(col("vmc")).collect().map(_.getLong(0))
    assert(series.toSeq == Seq(100000L, 200000L, 300000L, 400000L, 500000L))
  }

  test("q142: TWAP lies within [min, max] of the per-user values") {
    val twap = EventAnalytics.q142TimeWeightedAvg(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("twap")).toMap
    val bounds = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(min(col("value")), max(col("value")))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(twap.nonEmpty)
    twap.foreach { case (u, t) =>
      val (lo, hi) = bounds(u)
      assert(t >= lo - 0.01 && t <= hi + 0.01, s"user $u twap $t outside [$lo,$hi]")
    }
  }

  test("q144: transitions count every non-final event; probabilities sum to 1") {
    val rows = EventAnalytics.q144TransitionMatrix(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == nEvents - nUsers)
    rows.groupBy(_.getString(0)).foreach { case (_, grp) =>
      assert(math.abs(grp.map(_.getAs[Double]("p")).sum - 1.0) < 1e-9)
    }
  }

  test("q145: slope matches an exact Scala OLS recompute per user") {
    val got = EventAnalytics.q145TrendSlope(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("slope_cents_per_min")).toMap
    val raw = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("t"),
        expr("cast(round(value * 100) as bigint)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    raw.foreach { case (u, es) =>
      val t0 = es.map(_._2).min
      val xs = es.map(e => (e._2 - t0) / 60000000L)
      val ys = es.map(_._3)
      val n = BigDecimal(xs.length)
      val sx = BigDecimal(xs.sum); val sy = BigDecimal(ys.sum)
      val sxy = BigDecimal(xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum)
      val sxx = BigDecimal(xs.map(x => BigInt(x) * x).sum)
      val den = n * sxx - sx * sx
      if (den != 0) {
        val slope = ((n * sxy - sx * sy) / den).toDouble
        assert(math.abs(got(u) - slope) < 1e-6, s"user $u: ${got(u)} vs $slope")
      } else assert(!got.contains(u))
    }
  }

  test("q146: JDBC read splits into 4 range partitions") {
    val home = graft.core.Scratch.dir("derby_part_test")
    System.setProperty("derby.system.home", home)
    val base = Map(
      "url" -> s"jdbc:derby:$home/graftdb;create=true",
      "driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
      "dbtable" -> "orders_stage")
    graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .write.mode("overwrite").format("jdbc").options(base).save()
    val df = EtlQueries.jdbcPartitionedRead(spark, base)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == graft.sources.Tables.orders(spark, sf).count())
  }

  test("q147: point lookup reads one bucket of eight") {
    val t = "graft_q147_test"
    graft.etl.Warehouse.dropManagedTable(spark, t)
    graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(t)
    // a bare filter scan gets bucketed reading planner-disabled
    // (autoBucketedScan); grouping on the bucket column makes the bucketed
    // scan interesting — exactly q147's shape — and pruning kicks in
    val scan = EtlQueries.bucketPointLookup(spark, t, 7L)
      .groupBy(col("o_custkey")).agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
      s"expected bucket pruning, got:\n${scan.take(1500)}")
    graft.etl.Warehouse.dropManagedTable(spark, t)
  }

  test("q148: apply result = snapshot - deletes + inserts, updates repriced") {
    val got = EtlQueries.q148CdcApply(spark, sf)
      .agg(sum(col("n"))).collect().head.getLong(0)
    val o = graft.sources.Tables.orders(spark, sf)
    val nSnap = o.count()
    val nDel = o.filter(col("o_orderkey") % 7 === 0).count()
    val nIns = o.filter(col("o_orderkey") % 11 === 0).count()
    assert(got == nSnap - nDel + nIns)
  }

  test("q149: scoped DSv2 scan carries PushedAggregation") {
    val aggKey = "spark.sql.parquet.aggregatePushdown"
    val v1Key = "spark.sql.sources.useV1SourceList"
    val prevAgg = spark.conf.get(aggKey)
    val prevV1 = spark.conf.get(v1Key)
    spark.conf.set(aggKey, "true")
    spark.conf.set(v1Key, "")
    try {
      val plan = spark.read.parquet(s"$sf/lineitem.parquet")
        .agg(count(lit(1)).as("n"), min(col("l_orderkey")).as("min_key"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)") ||
        plan.contains("PushedAggregation: [MIN"),
        s"expected footer-stats aggregation, got:\n${plan.take(1500)}")
    } finally {
      spark.conf.set(aggKey, prevAgg)
      spark.conf.set(v1Key, prevV1)
    }
  }

  test("q150: every pipeline stage provably filtered something") {
    val r = Curation.q150TrainingPipeline(spark, sf).collect().head
    val (corpus, en, quality, dedup, clean) =
      (r.getAs[Long]("n_corpus"), r.getAs[Long]("n_en"), r.getAs[Long]("n_quality"),
        r.getAs[Long]("n_dedup"), r.getAs[Long]("n_clean"))
    assert(corpus > en, "language gate must drop non-en docs")
    assert(quality <= en)
    assert(dedup < quality, "planted duplicates must be removed")
    assert(clean < dedup, "planted contamination must be removed")
    assert(clean > 0)
    // packs partition the survivors
    val rows = Curation.q150TrainingPipeline(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == clean)
    val packIds = rows.map(_.getAs[Long]("pack_id")).toSeq
    assert(packIds == packIds.sorted && packIds.distinct == packIds)
  }

  test("q151: identical pixel content hashes identically; the 8 patterns stay distinct") {
    val hashes = (0 until 8).map(s => Multimodal.aHash(Multimodal.makePatternBmp(s)))
    assert(hashes.distinct.length == 8, "pattern seeds must not collide")
    assert(Multimodal.aHash(Multimodal.makePatternBmp(3)) == hashes(3))
    val rows = Multimodal.q151ImageAhashDedup(spark, sf).collect()
    assert(rows.length == 8 && rows.forall(_.getAs[Long]("n_groups") == 8))
  }

  test("q152: boilerplate survives exactly once across the corpus") {
    val rows = TextAnalysis.q152ParagraphDedup(spark, sf).collect()
    val withBoiler = rows.filter(_.getAs[String]("kept_text")
      .contains(TextAnalysis.Q152Boiler))
    assert(withBoiler.length == 1 && withBoiler.head.getLong(0) == 0L,
      "only the first document keeps the planted header")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_after") <= r.getAs[Long]("n_before"))
    }
    // every doc except the first lost at least the boilerplate paragraph
    assert(rows.count(r => r.getAs[Long]("n_after") < r.getAs[Long]("n_before"))
      >= rows.length - 1)
  }

  test("q153: PCM frame stats match the synthesis closed form") {
    val (frames, silent, maxAmp) =
      Multimodal.wavFrameStats(Multimodal.makePatternWav(3))
    assert(frames == 32 && silent == 24 && maxAmp == 1000)
    val rows = Multimodal.q153AudioSilence(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_silent") == (r.getLong(0) % 4) * 8)
    }
  }

  test("q141: plan stays free of O(n^2) unbounded-following frames") {
    val plan = EventAnalytics.q141InterpolateFill(spark, sf)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("unboundedfollowing"),
      "next-known lookup must use a running frame over the reversed order")
  }

  test("q150: the gram decontamination join broadcasts the eval side") {
    val plan = Curation.q150TrainingPipeline(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("q154: cosine is bounded by (0, 1] and symmetric in its marginals") {
    val rows = Relational.q154CooccurrenceCosine(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c > 0.0 && c <= 1.0)
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
    }
  }

  test("q155: first week per priority is null-change; pct matches recompute") {
    val rows = Relational.q155PeriodOverPeriod(spark, sf).collect()
    val byPrio = rows.groupBy(_.getString(0))
    byPrio.foreach { case (_, rs) =>
      assert(rs.head.isNullAt(3) && rs.head.isNullAt(4), "first week must be NULL change")
      rs.sliding(2).foreach {
        case Array(prev, cur) if !cur.isNullAt(3) =>
          val expect = cur.getDouble(2) - prev.getDouble(2)
          assert(math.abs(cur.getDouble(3) - expect) < 1e-9)
        case _ =>
      }
    }
  }

  test("q156: every result satisfies the predicate; label filter reaches the scan") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val results = Similarity.q156FilteredAnn(spark, sf).collect().map(_.getLong(0)).toSet
    val allowed = emb.filter(col("label").isin(1, 2, 3))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(results.nonEmpty && results.subsetOf(allowed))
    val scan = Similarity.q156FilteredAnn(spark, sf)
      .queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scan.exists(_.contains("In(label")),
      "label predicate must be pushed to the parquet scan")
  }

  test("q157: containment catches a planted quotation Jaccard misses") {
    import spark.implicits._
    // 5-word doc fully contained in a 40-word doc: jaccard 5/40 = 0.125,
    // containment a→b = 1.0
    val small = "alpha beta gamma delta epsilon"
    val big = small + " " + (1 to 35).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val words = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("word"))
    val sizes = words.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes(1L) == 5 && sizes(2L) == 40)
    val r = Dedup.q157ContainmentJoin(spark, sf) // operator runs on fixture
    assert(r.columns.toSeq == Seq("doc_a", "doc_b", "c_ab", "c_ba"))
    r.collect().foreach { row =>
      assert(row.getDouble(2) >= 0.9 || row.getDouble(3) >= 0.9)
      assert(row.getDouble(2) <= 1.0 && row.getDouble(3) <= 1.0)
    }
  }

  test("q158: bounces have entry == exit; session count matches q87's islands") {
    val rows = EventAnalytics.q158SessionMatrix(spark, sf).collect()
    rows.filter(_.getAs[Long]("n_bounces") > 0).foreach { r =>
      // a 1-event session's entry and exit are the same event, so any cell
      // with bounces on the off-diagonal would be a bug
      if (r.getString(0) != r.getString(1))
        assert(r.getAs[Long]("n_bounces") == 0)
    }
    val total = rows.map(_.getAs[Long]("n_sessions")).sum
    assert(total > 0)
    rows.foreach(r => assert(r.getAs[Double]("avg_events") >= 1.0))
  }

  test("q159: exact-moment mean/sd agree with Spark's builtin estimators") {
    val r = Profiling.q159ZscoreOutliers(spark, sf).collect().head
    val ref = graft.sources.Tables.orders(spark, sf)
      .agg(avg(col("o_totalprice")), stddev_samp(col("o_totalprice")))
      .collect().head
    assert(math.abs(r.getAs[Double]("mean_price") - ref.getDouble(0)) < 1e-6)
    assert(math.abs(r.getAs[Double]("sd_price") - ref.getDouble(1)) < 1e-6)
    assert(r.getAs[Long]("n_outliers") >= 0 &&
      r.getAs[Long]("n_outliers") < r.getAs[Long]("n_rows"))
  }

  test("q160: chi-square statistic is non-negative with the right dof") {
    val r = EventAnalytics.q160ChiSquare(spark, sf).collect().head
    assert(r.getAs[Long]("chi2_micro") >= 0)
    assert(r.getAs[Double]("chi2") >= 0.0)
    assert(r.getAs[Long]("dof") == 16, "5x5 event-type table has (5-1)^2 dof")
  }

  test("q161: quintiles partition customers evenly; segment spend sums to total") {
    val rows = Relational.q161RfmSegmentation(spark, sf).collect()
    val per = graft.sources.Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == per)
    val totalSpend = graft.sources.Tables.orders(spark, sf)
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)"))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("segment_spend_c")).sum == totalSpend)
    rows.foreach { r =>
      Seq("r_q", "f_q", "m_q").foreach(c =>
        assert(r.getAs[Long](c) >= 1 && r.getAs[Long](c) <= 5))
    }
  }

  test("q162: survivors prefer quality; identical copies fall to the id rule") {
    val r = Dedup.q162DedupSurvivorship(spark, sf).collect().head
    val nBase = graft.sources.Tables.documents(spark, sf).count()
    val nTrunc = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 25 === 0).count()
    val nIdent = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 35 === 0).count()
    assert(r.getAs[Long]("n_docs") == nBase + nTrunc + nIdent)
    assert(r.getAs[Long]("n_dup_groups") >= nTrunc.max(nIdent))
    // no planted id (>=500000) may survive: truncated copies lose on
    // quality, identical copies lose the min-id tie-break
    assert(r.getAs[Long]("max_survivor") < 500000L)
  }

  test("q163: drift shares are consistent with raw counts") {
    val rows = TextAnalysis.q163TermDrift(spark, sf).collect()
    assert(rows.length == 20)
    val ppm = rows.map(_.getAs[Double]("drift_ppm"))
    assert(ppm.toSeq == ppm.sorted.reverse.toSeq, "must be ranked by drift")
    assert(ppm.head > 0)
  }

  test("q164: growth curve is cumulative and saturating-monotone") {
    val rows = TextAnalysis.q164VocabGrowth(spark, sf).collect()
    assert(rows.length >= 2, "bigram types must not all appear in one tranche")
    val cums = rows.map(_.getAs[Long]("cum_types"))
    assert(cums.toSeq == cums.sorted.toSeq)
    assert(cums.last == rows.map(_.getAs[Long]("new_types")).sum)
    // first tranche sees the most new types on a stationary corpus
    assert(rows.head.getAs[Long]("new_types") == rows.map(_.getAs[Long]("new_types")).max)
  }

  test("q165: latency percentiles are real observed values, ordered sanely") {
    val r = EventAnalytics.q165FunnelLatency(spark, sf).collect().head
    val med = r.getAs[Double]("median_latency_s")
    val p90 = r.getAs[Double]("p90_latency_s")
    assert(r.getAs[Long]("n_converted") > 0)
    assert(med > 0 && p90 >= med)
    // percentiles must be actual observed latencies
    val lats = {
      val ev = graft.sources.Tables.events(spark, sf)
        .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("t"))
      val v1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("t")).as("t1"))
      ev.filter(col("event_type") === "purchase").join(v1, Seq("user_id"))
        .filter(col("t") > col("t1"))
        .groupBy(col("user_id")).agg((min(col("t")) - min(col("t1"))).as("lat"))
        .collect().map(_.getLong(1) / 1e6).toSet
    }
    assert(lats.contains(med) && lats.contains(p90))
  }

  test("q132: clamp bounds are real elements of the column") {
    val bounds = Relational.q132Winsorize(spark, sf)
      .select(col("l_returnflag"), col("p01"), col("p99")).collect()
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSet)
    bounds.foreach { r =>
      val vals = li(r.getString(0))
      assert(vals.contains(r.getDouble(1)) && vals.contains(r.getDouble(2)),
        "rank-selected thresholds must be actual column values")
    }
  }
}
