package graft

import org.apache.spark.sql.functions._

/** Round-12 hardening:
  *  - q397's small-overlap semantics pinned on a PLANTED disjoint source
  *    pair (verdict #6): HLL inclusion–exclusion legitimately estimates
  *    NEGATIVE when sketch error exceeds a near-zero true overlap, and the
  *    declared semantics is the SIGNED estimate (no clamp) — the
  *    undershoot magnitude is the error readout. The fixture proves the
  *    negative branch is reachable and unclamped.
  *  - the closing gates made STRUCTURAL (verdict #2): every
  *    `SparkEntry.queries` key must be mentioned in COVERAGE.md, SCALE.md
  *    and README.md — the three-rounds-running "last batch missed the
  *    docs" residual class becomes a red build instead of a verdict item.
  */
class Round12Spec extends SparkSuite {

  // ------------------------------------------------------- q397 disjoint
  test("q397: disjoint source pair — signed (unclamped) negative estimate") {
    val dir = java.nio.file.Files.createTempDirectory("q397fix").toString
    import spark.implicits._
    // src0/src3 share ZERO 8-char shingles (disjoint alphabets); src1/src2
    // exist because q397's pair list references them. ~40 distinct
    // shingles per source → linear-counting regime (hit < 64), where the
    // register-count function est(h) = 64·ln(64/(64−h))·1000 is CONVEX
    // with est(0)=0, so disjoint bucket sets give est_u ≥ est_a + est_b
    // and the inclusion–exclusion intersection lands ≤ 0.
    def doc(id: Long, src: String, text: String) =
      (id, text, "en", src, text.length.toLong)
    val rows =
      (0L to 9L).map(i => doc(i, "src0", s"alphaalpha bravobravo charlie$i delta${i}delta echo${i}echofox")) ++
      (10L to 19L).map(i => doc(i, "src3", s"ZULUZULUZU YANKEEYANK xray$i WHISKY${i}WT victor${i}VICTO")) ++
      (20L to 24L).map(i => doc(i, "src1", s"golfgolfgo hotelhotel india$i juliet${i}JL kilo${i}kilolo")) ++
      (25L to 29L).map(i => doc(i, "src2", s"limalimali mikemikemi nov$i oscar${i}OSC papa${i}papapa"))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q397_hll_intersection")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val dj = out(("src0", "src3"))
    assert(dj.getLong(2) === 0L, "planted pair must be exactly disjoint")
    val estA = dj.getLong(3); val estB = dj.getLong(4)
    val estU = dj.getLong(5); val estI = dj.getLong(6)
    // declared semantics: SIGNED estimate, exactly a + b − u, never clamped
    assert(estI === estA + estB - estU,
      "est_inter_milli must be the raw signed inclusion–exclusion value")
    assert(estI <= 0L,
      s"disjoint pair in the linear-counting regime must estimate ≤ 0 " +
        s"(convexity argument) — got $estI; the negative branch must be " +
        s"reachable, not clamped away")
    // and a genuinely-overlapping pair on the SAME fixture stays sane:
    // n_exact > 0 is not required for src0/src1 (also disjoint here), but
    // every row must satisfy the same signed identity
    out.values.foreach { r =>
      assert(r.getLong(6) === r.getLong(3) + r.getLong(4) - r.getLong(5))
    }
  }

  // ------------------------------------------ structural closing gates
  // Every catalog key must appear (as its qNNN token, or inside a
  // qAAA–qBBB / qAAA-qBBB range) in each closing document. Rounds 9, 10
  // and 11 each shipped a tail batch that missed SCALE.md / COVERAGE.md /
  // README.md — this makes the omission a red build in the landing
  // commit, not a verdict item a round later.
  private[graft] def mentionedNums(text: String): Set[Int] = {
    val single = raw"q(\d+)".r
    val range = raw"q(\d+)\s*[–\-—]\s*q(\d+)".r
    val singles = single.findAllMatchIn(text).map(_.group(1).toInt).toSet
    val ranges = range.findAllMatchIn(text).flatMap { m =>
      val a = m.group(1).toInt; val b = m.group(2).toInt
      if (b > a && b - a < 1000) (a to b) else Seq.empty
    }.toSet
    singles ++ ranges
  }

  private def qNum(key: String): Int = raw"q(\d+)_.*".r
    .findFirstMatchIn(key).map(_.group(1).toInt)
    .getOrElse(fail(s"catalog key '$key' is not qNNN_-shaped"))

  private def missingFrom(docPath: String): Seq[String] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(docPath)), "UTF-8")
    val nums = mentionedNums(text)
    SparkEntry.queries.keys.toSeq.filterNot(k => nums(qNum(k))).sorted
  }

  test("closing gate: every catalog key is documented in COVERAGE.md") {
    val m = missingFrom("COVERAGE.md")
    assert(m.isEmpty, s"COVERAGE.md is missing: ${m.mkString(", ")} — " +
      "add the operator row in the landing commit")
  }

  test("closing gate: every catalog key has a SCALE.md mention") {
    val m = missingFrom("SCALE.md")
    assert(m.isEmpty, s"SCALE.md is missing: ${m.mkString(", ")} — " +
      "add the measured growth row in the landing commit")
  }

  test("closing gate: every catalog key has a README.md mention") {
    val m = missingFrom("README.md")
    assert(m.isEmpty, s"README.md is missing: ${m.mkString(", ")} — " +
      "add the catalog entry in the landing commit")
  }

  // ------------------------------------------------- round-12 operators
  private lazy val rankFixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("r12rank").toString
    import spark.implicits._
    // balances with a tie at 200.00; order counts with a tie at 2 —
    // midrank + tie-mass arithmetic must survive both
    Seq((1L, 100.0, "A"), (2L, 200.0, "B"), (3L, 200.0, "A"),
        (4L, 300.0, "B"), (5L, 400.0, "A"))
      .toDF("c_custkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val orders = (1L to 1L).map(i => (i, 1L)) ++
      Seq((2L, 2L), (3L, 2L), (4L, 3L), (5L, 10L))
    orders.flatMap { case (ck, n) => (1L to n).map(j => (ck * 100 + j, ck)) }
      .toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("q402: hand-checked midrank Spearman on a tied fixture") {
    val r = SparkEntry.queries("q402_spearman_rank")(spark, rankFixtureDir)
      .collect()(0)
    // balances 100,200,200,300,400 → minranks 1,2,2,4,5; rx2 = 2·avg:
    // 2,5,5,8,10. counts 1,2,2,3,10 → ry2 identical: 2,5,5,8,10 → δ=0,
    // perfectly monotone: rho_ppm = 1000000 despite the ties
    assert(r.getLong(0) === 5L)                  // n
    assert(r.getLong(1) === 0L)                  // sum_d2_x4
    assert(r.getLong(2) === 6L && r.getLong(3) === 6L) // tie masses 2³−2
    assert(r.getLong(4) === 1000000L)            // rho_ppm
  }

  test("q405: Kruskal-Wallis invariants + brute midrank replay") {
    val rows = SparkEntry.queries("q405_kruskal_wallis")(spark, sf).collect()
    val n = rows.head.getLong(3)
    assert(rows.map(_.getLong(1)).sum === n, "group sizes must sum to n")
    val h = rows.head.getLong(5); val hp = rows.head.getLong(6)
    assert(h >= 0L && hp >= h, "tie correction can only inflate H")
    assert(rows.forall(_.getBoolean(7) === (hp > 9488L)))
    // brute midrank replay of the twice-rank sums on the real sf data
    val base = graft.sources.Tables.customer(spark, sf)
      .selectExpr("c_mktsegment AS seg", "cast(round(c_acctbal * 100) as bigint) AS x")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val sorted = base.map(_._2).sorted
    val minrank = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2).min + 1L) }
    val cnt = base.groupBy(_._2).map { case (v, xs) => v -> xs.length.toLong }
    val r2 = base.groupBy(_._1).map { case (seg, xs) =>
      seg -> xs.map { case (_, v) => 2L * minrank(v) + cnt(v) - 1L }.sum }
    rows.foreach { r =>
      assert(r.getLong(2) === r2(r.getString(0)),
        s"twice-rank sum mismatch for ${r.getString(0)}")
    }
  }

  test("q403: posting compression invariants off the stored index") {
    val rows = SparkEntry.queries("q403_posting_compression")(spark, sf).collect()
    assert(rows.length === 20)
    val dfs = rows.map(_.getLong(1))
    assert(dfs.sameElements(dfs.sorted.reverse), "rows must order by df desc")
    rows.foreach { r =>
      val df = r.getLong(1); val bits = r.getLong(2); val vb = r.getLong(3)
      assert(bits >= 64L && vb >= 10L, "first posting charged 64 bits")
      assert(r.getLong(4) === df * 8, "raw cost is 8 bytes per doc_id")
      assert(vb <= df * 10L, "varint can never exceed 10 bytes per posting")
    }
  }

  test("q404: RLE conservation + brute pattern-0 replay") {
    val rows = SparkEntry.queries("q404_rle_estimate")(spark, sf).collect()
    assert(rows.forall(_.getBoolean(4)), "pixel conservation must hold")
    assert(rows.forall(_.getLong(3) === 3072L))
    // brute replay of pattern 0 from the public pixel formula
    val p0 = rows.find(_.getLong(0) === 0L).get
    var runs = 0L
    for (y <- 0 until 48) {
      var prev = -1L
      for (x <- 0 until 64) {
        val q = ((x * 31 + y * 17) % 256) / 64
        if (q != prev) { runs += 1; prev = q }
      }
    }
    assert(p0.getLong(2) === runs, s"pattern-0 run count must be $runs")
  }

  test("q406: token-bucket machine on a planted burst fixture") {
    val dir = java.nio.file.Files.createTempDirectory("r12tb").toString
    import spark.implicits._
    // one type, 4 events: t=0 (full bucket, admit, 1000 left), t=+1s
    // (refill 1 milli → 1001, admit, 1 left), t=+2s (2 < 1000, DROP),
    // t=+2000001s (refill ≫ cap → capped 2000, admit, 1000 left).
    // event_ids are multiples of 100 so the 1% shadow filter keeps them.
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    Seq((0L, ts(0), 1L, "click", 1.0, "{}"),
        (100L, ts(1), 1L, "click", 1.0, "{}"),
        (200L, ts(2), 1L, "click", 1.0, "{}"),
        (300L, ts(2000001L), 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events_dir")
    // eventsStream stages $d/events.parquet as a single FILE (hardlink) —
    // move the one part file out of the Spark-written directory
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/events_dir"))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$dir/events.parquet"))
    val r = SparkEntry.queries("q406_stream_token_bucket")(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getString(0) === "click")
    assert(r(0).getLong(1) === 4L, "events seen")
    assert(r(0).getLong(2) === 3L, "admitted")
    assert(r(0).getLong(3) === 1L, "dropped")
    assert(r(0).getLong(4) === 1000L, "final bucket level")
  }

  test("q407: Allen census pair-count conservation") {
    val rows = SparkEntry.queries("q407_allen_census")(spark, sf).collect()
    val total = rows.map(_.getLong(3)).sum
    // Σ over users C(k_u, 2) where k_u = distinct event types of user u
    val expected = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type").distinct()
      .groupBy("user_id").count().collect()
      .map(r => { val k = r.getLong(1); k * (k - 1) / 2 }).sum
    assert(total === expected, "census must count every unordered type pair once")
    val rels = Set("before", "after", "meets", "met_by", "equals", "starts",
      "started_by", "finishes", "finished_by", "during", "contains",
      "overlaps", "overlapped_by")
    assert(rows.forall(r => rels(r.getString(2))))
  }

  test("q408: dictionary audit knows returnflag is a 3-value column") {
    val rows = SparkEntry.queries("q408_dict_encoding")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val rf = rows("l_returnflag")
    assert(rf.getLong(2) === 3L, "returnflag has exactly 3 distinct values")
    assert(rf.getLong(5) === 2L, "3 values need 2-bit codes")
    assert(rf.getLong(3) === rf.getLong(1), "1-char values: raw bytes = rows")
    // dict wins hugely on a 1-char 3-value column: 2 bits vs 8
    assert(rf.getLong(7) < 300000L, "dictionary must win on returnflag")
    rows.values.foreach { r =>
      assert(r.getLong(6) === r.getLong(4) + (r.getLong(1) * r.getLong(5) + 7) / 8,
        s"dict_bytes formula must hold for ${r.getString(0)}")
    }
  }

  test("q409: weighted Jaccard bounds on all 190 source pairs") {
    val rows = SparkEntry.queries("q409_weighted_jaccard")(spark, sf).collect()
    assert(rows.length === 190, "C(20,2) source pairs")
    rows.foreach { r =>
      val (wa, wb, smin, j) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(smin <= math.min(wa, wb), "Σmin bounded by either total")
      assert(j >= 0L && j <= 1000000L)
    }
  }

  test("q410: percolation emits all five subscriptions with sane ranges") {
    val rows = SparkEntry.queries("q410_percolate")(spark, sf).collect()
    assert(rows.length === 5)
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    rows.foreach { r =>
      assert(r.getLong(1) > 0L, "top-df term pairs must co-occur somewhere")
      assert(r.getLong(2) <= r.getLong(3))
      assert(r.getLong(4) >= 2L * r.getLong(1),
        "each matching doc carries >= 1 occurrence of each of the 2 terms")
    }
  }

  test("q411: roaring never loses to the naive bitmap") {
    val rows = SparkEntry.queries("q411_roaring_sizing")(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4), "LEAST() can't exceed the bitmap cost")
      assert(r.getLong(5) >= 0L)
      assert(r.getLong(2) >= 1L)
    }
  }

  test("q412: DPCM brute replay of the seed-0 square wave") {
    val rows = SparkEntry.queries("q412_dpcm_estimate")(spark, sf).collect()
    assert(rows.forall(_.getBoolean(3)), "sample conservation must hold")
    val s0 = rows.find(_.getLong(0) === 0L).get
    // seed 0: 8192 samples alternating ±1000 every 8 samples — Δ≠0 exactly
    // at i % 8 == 0 (1,023 times, |Δ|=2000 → 12 bits), Δ=0 elsewhere
    // (7,168 times → 2 bits), first sample 16
    val expected = 16L + 1023L * 12L + 7168L * 2L
    assert(s0.getLong(4) === expected, s"seed-0 dpcm bits must be $expected")
    rows.foreach(r => assert(r.getLong(4) < r.getLong(5), "DPCM must beat raw"))
  }

  test("q413: merge-sync class counts follow the carving arithmetic") {
    val rows = SparkEntry.queries("q413_merge_sync")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("insert", "delete", "update", "unchanged"))
    assert(rows.values.forall(_.getBoolean(2)), "apply must equal source exactly")
    // carving: inserts are keys ≡0 (mod 7) ∧ ≢0 (mod 5); deletes the
    // mirror image; brute-count from the orders table
    val keys = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    assert(rows("insert").getLong(1) ===
      keys.count(k => k % 7 == 0 && k % 5 != 0).toLong)
    assert(rows("delete").getLong(1) ===
      keys.count(k => k % 5 == 0 && k % 7 != 0).toLong)
    assert(rows("update").getLong(1) ===
      keys.count(k => k % 7 != 0 && k % 5 != 0 && k % 3 == 0).toLong)
  }

  test("q414: correlogram emits all 14 lags with bounded r²") {
    val rows = SparkEntry.queries("q414_acf_spectrum")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 14L))
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
      assert(math.abs(r.getLong(2)) <= 1L)
      // pairs shrink as the lag grows (contiguous daily series)
      assert(r.getLong(1) > 0L)
    }
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a },
      "pair count must be non-increasing in the lag")
  }

  test("q415: inversion audit is conservation-consistent") {
    val rows = SparkEntry.queries("q415_inversion_audit")(spark, sf).collect()
    val tn = rows.map(_.getLong(1)).sum
    val ti = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      assert(r.getLong(4) === ti * 1000000 / tn, "global ppm must ride every row")
      assert(r.getLong(2) <= r.getLong(1))
    }
    // the synthetic generator allocates event_ids in ts order, so the
    // planted truth is ZERO inversions — the audit's null result is the
    // certificate (any nonzero here means the window mis-orders)
    assert(ti === 0L)
  }

  test("q416: recall curve is monotone non-decreasing in nprobe") {
    val rows = SparkEntry.queries("q416_nprobe_curve")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 4L))
    val hits = rows.map(_.getLong(1))
    assert(hits.zip(hits.tail).forall { case (a, b) => b >= a },
      "more probes can only add candidates")
    assert(hits.forall(h => h >= 0L && h <= 100L))
    rows.foreach(r => assert(r.getLong(2) === r.getLong(1) * 10000L))
  }

  test("q417: bridge identity holds on every week transition") {
    val rows = SparkEntry.queries("q417_revenue_bridge")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(8)), "waterfall identity must be exact")
    rows.foreach { r =>
      // recompute the identity from the emitted integers
      val (n0, n1, r0, r1) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(r.getLong(6) === (n1 - n0) * r0)
      assert(r.getLong(7) === n0 * r1 - n1 * r0)
    }
  }

  test("closing gate: catalog is gapless and COVERAGE.md header states the count") {
    val nums = SparkEntry.queries.keys.toSeq.map(qNum).sorted
    assert(nums === (1 to nums.max), "catalog must be gapless q01..qMAX")
    val cov = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    assert(cov.contains(s"every one of the ${nums.max} queries (gapless q01–q${nums.max})"),
      s"COVERAGE.md header must state the current count ${nums.max} — " +
        "the rounds-9..11 stale-counter class is a red build now")
  }

  test("q418: quartile lattice brute replay per returnflag") {
    val rows = SparkEntry.queries("q418_tukey_fences")(spark, sf).collect()
    assert(rows.length === 3)
    val base = graft.sources.Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag", "cast(round(l_extendedprice * 100) as bigint) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val vs = base.filter(_._1 == r.getString(0)).map(_._2).sorted
      val n = vs.length
      def qx4(num: Long): Long = {
        val lo = (num / 4).toInt; val rem = num % 4
        vs(lo) * (4 - rem) + (if (rem > 0) vs(lo + 1) * rem else 0L)
      }
      assert(r.getLong(1) === n.toLong)
      assert(r.getLong(2) === qx4(n - 1L), s"q1 for ${r.getString(0)}")
      assert(r.getLong(3) === qx4(3L * (n - 1)), s"q3 for ${r.getString(0)}")
      val (q1, q3) = (r.getLong(2), r.getLong(3))
      assert(r.getLong(5) === vs.count(v => v * 8 < 5 * q1 - 3 * q3).toLong)
      assert(r.getLong(6) === vs.count(v => v * 8 > 5 * q3 - 3 * q1).toLong)
    }
  }

  test("q419: heartbeat fold equals the brute per-type max gap") {
    val rows = SparkEntry.queries("q419_stream_heartbeat")(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) AS tus", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val ts = ev.filter(_._1 == r.getString(0)).sortBy(e => (e._2, e._3)).map(_._2)
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      assert(r.getLong(1) === ts.length.toLong)
      assert(r.getLong(2) === (if (gaps.isEmpty) 0L else gaps.max))
      assert(r.getLong(3) === ts.max)
    }
  }

  test("q420: OTHER rollup conserves each priority's exact total") {
    val rows = SparkEntry.queries("q420_topk_others")(spark, sf).collect()
    val byP = rows.groupBy(_.getString(0))
    val totals = graft.sources.Tables.orders(spark, sf)
      .selectExpr("o_orderpriority AS p",
        "cast(round(o_totalprice * 100) as decimal(38,0)) AS c")
      .groupBy("p").agg(expr("cast(sum(c) as bigint)").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byP.foreach { case (p, rs) =>
      assert(rs.map(_.getLong(2)).sum === totals(p),
        s"priority $p rows must sum to the exact total (conservation)")
      assert(rs.count(_.getString(1) != "OTHER") <= 3)
      assert(rs.count(_.getString(1) == "OTHER") <= 1)
    }
  }

  test("closing gate self-test: a planted undocumented key would fail") {
    // the gate must actually discriminate: a key whose number appears in
    // no document is reported missing, and the range expansion works
    assert(!mentionedNums("q100, q205–q207").contains(999))
    assert(mentionedNums("q205–q207").contains(206))
    assert(mentionedNums("q205-q207").contains(206))
    assert(mentionedNums("q01").contains(1))
  }
}
