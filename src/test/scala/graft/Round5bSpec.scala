package graft

import graft.operators._

import org.apache.spark.sql.functions._

/** Round-5 specs: hot-basket cap for the pair-mining self-joins (the
  * Linkage.MaxBlockSize pattern applied to basket keys).
  */
class Round5bSpec extends SparkSuite {

  test("basket cap: degenerate hot basket truncates deterministically, overflow is loud") {
    import spark.implicits._
    val giant = (1 to 5000).map(i => (1L, i.toLong)) ++ Seq((2L, 1L), (2L, 2L))
    val df = giant.toDF("l_orderkey", "l_partkey")
    val capped = Relational.cappedBasketItems(df, "l_orderkey", "l_partkey")
    assert(capped.count() == Relational.MaxBasketSize + 2L)
    // the lowest item ids survive — deterministic, not sample-dependent
    assert(capped.filter(col("l_orderkey") === 1L)
      .agg(max(col("l_partkey"))).head.getLong(0) == Relational.MaxBasketSize.toLong)
    val overflow = Relational.basketOverflow(df, "l_orderkey").collect()
    assert(overflow.length == 1)
    val r = overflow.head
    assert(r.getAs[Long]("basket") == 1L)
    assert(r.getAs[Long]("basket_size") == 5000L)
    assert(r.getAs[Long]("kept") == Relational.MaxBasketSize.toLong)
    assert(r.getAs[Long]("dropped") == 5000L - Relational.MaxBasketSize)
    // and the pair mining itself completes on the capped frame: k(k−1)/2
    // pairs inside the hot basket instead of ~12.5M
    val a = capped.as("a"); val b = capped.as("b")
    val nPairs = a.join(b, col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey")).count()
    val k = Relational.MaxBasketSize.toLong
    assert(nPairs == k * (k - 1) / 2 + 1)
  }

  test("q123/q154: no TPC-H basket overflows, so the cap never changes the oracle") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    assert(Relational.basketOverflow(li, "l_orderkey").isEmpty,
      "fixture baskets must stay far below MaxBasketSize")
  }

  test("star CC: star-of-chains (high degree AND high diameter) converges in ≤ 2·log₂ n") {
    // hub 0 fans out to 8 chains of 64 nodes each — the large-star pass sees
    // a 9-degree-ish hub neighborhood growing every round while the chains
    // keep the diameter at 65. n = 513, so the O(log² n)-class bound the
    // algorithm claims must land well under 2·log₂(513) ≈ 18 rounds (the
    // min-label variant would need ~65).
    import spark.implicits._
    val nChains = 8; val chainLen = 64
    val chainEdges = for {
      c <- 0 until nChains; i <- 0 until (chainLen - 1)
    } yield (c * chainLen + 1L + i, c * chainLen + 2L + i)
    val hubEdges = (0 until nChains).map(c => (0L, c * chainLen + 1L))
    val edges = (hubEdges ++ chainEdges).toDF("doc_a", "doc_b")
    val nodes = (0L to (nChains * chainLen).toLong).toDF("id")
    val (labels, rounds) =
      Dedup.connectedComponentsStarWithRounds(nodes, edges)
    val comps = labels.select(col("component")).distinct().collect().map(_.getLong(0))
    assert(comps.toSeq == Seq(0L), s"one component expected, got ${comps.toSeq}")
    val n = nChains * chainLen + 1
    val bound = 2 * math.ceil(math.log(n.toDouble) / math.log(2.0)).toInt
    assert(rounds <= bound, s"took $rounds rounds, bound is $bound")
  }
}
