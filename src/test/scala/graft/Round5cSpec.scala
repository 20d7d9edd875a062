package graft

import graft.operators._

import org.apache.spark.sql.functions._

/** Round-5 additions: skyline frontier, interval-union coverage,
  * last-touch attribution, sliding distinct counts — each certified
  * against an algorithm-independent formulation on adversarial fixtures
  * (ties, containment, no-touch users) the sf fixtures don't stress.
  */
class Round5cSpec extends SparkSuite {

  test("skyline: two-phase prefix-max agrees with brute-force dominance under ties") {
    import spark.implicits._
    // price ties, size ties, duplicate (price,size) points, a dominated
    // duplicate, and a point dominated only within its own price group
    val pts = Seq(
      (1L, "a", 10, 100.0), (2L, "b", 10, 100.0), // co-equal duplicates: both survive
      (3L, "c", 9, 100.0),                        // dominated within price group
      (4L, "d", 12, 200.0),                       // survives: bigger size at higher price
      (5L, "e", 12, 300.0),                       // dominated by 4 (same size, pricier)
      (6L, "f", 1, 50.0),                         // survives: cheapest
      (7L, "g", 10, 150.0)                        // dominated by 1/2 (cheaper, same size)
    ).toDF("p_partkey", "p_name", "p_size", "p_retailprice")
    pts.createOrReplaceTempView("sky_pts")
    val brute = spark.sql(
      """SELECT p_partkey FROM sky_pts p
         WHERE NOT EXISTS (
           SELECT 1 FROM sky_pts q
           WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
             AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))""")
      .collect().map(_.getLong(0)).toSet
    // replay the q170 frontier logic on the same frame
    import org.apache.spark.sql.expressions.Window
    val g = pts.groupBy(col("p_retailprice")).agg(max(col("p_size")).as("gmax"))
      .withColumn("bucket", expr("cast(round(p_retailprice * 100) as bigint) div 10000"))
    val wL = Window.partitionBy(col("bucket")).orderBy(col("p_retailprice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wB = Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = g.groupBy(col("bucket")).agg(max(col("gmax")).as("bmax"))
      .withColumn("omax", max(col("bmax")).over(wB)).select("bucket", "omax")
    val frontier = g.withColumn("lmax", max(col("gmax")).over(wL))
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("prevmax", greatest(coalesce(col("lmax"), lit(Int.MinValue)),
        coalesce(col("omax"), lit(Int.MinValue))))
      .filter(col("prevmax") < col("gmax"))
    val got = pts.join(frontier.select(col("p_retailprice").as("sp"), col("gmax")),
        pts("p_retailprice") === col("sp") && pts("p_size") === col("gmax"))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(got == brute, s"skyline=$got brute=$brute")
    assert(got == Set(1L, 2L, 4L, 6L))
  }

  test("interval coverage: containment, duplicates, and touching intervals") {
    import spark.implicits._
    val iv = Seq(
      // user 1: [0,100) ∪ [10,20) (contained) ∪ [50,200) (overlap) = 200
      (1L, 0L, 100L), (1L, 10L, 20L), (1L, 50L, 200L),
      // user 2: touching intervals [0,10) ∪ [10,20) = 20, plus duplicate
      (2L, 0L, 10L), (2L, 10L, 20L), (2L, 10L, 20L),
      // user 3: disjoint [0,5) ∪ [100,105) = 10
      (3L, 0L, 5L), (3L, 100L, 105L)
    ).toDF("user_id", "s", "e")
    val got = EventAnalytics.intervalCoverage(iv)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 200L, 2L -> 20L, 3L -> 10L))
  }

  test("last-touch attribution: purchase with no prior touch goes to direct") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Seq(
      (1L, 1L, 100L, "purchase", 5.0),  // before any touch → direct
      (2L, 1L, 200L, "view", 0.0),
      (3L, 1L, 300L, "purchase", 7.0),  // → view
      (4L, 2L, 100L, "click", 0.0),
      (5L, 2L, 200L, "view", 0.0),
      (6L, 2L, 300L, "purchase", 9.0)   // → view (latest touch wins)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val got = ev
      .withColumn("touch", last(when(col("event_type").isin("view", "click"),
        col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), coalesce(col("touch"), lit("direct")).as("channel"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "direct", 3L -> "view", 6L -> "view"))
  }

  test("gaps & islands: anti-join boundary pairing equals the row_number formulation") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // singleton islands, adjacent runs, a long run, and a gap of exactly 2
    val keys = Seq(1L, 2L, 3L, 5L, 7L, 8L, 100L, 101L, 102L, 103L, 200L)
    val k = keys.toDF("k")
    val starts = k.join(k.select((col("k") + 1).as("k")), Seq("k"), "left_anti")
    val ends = k.join(k.select((col("k") - 1).as("k")), Seq("k"), "left_anti")
    val w = Window.orderBy(col("k"))
    val got = starts.withColumn("rn", row_number().over(w))
      .select(col("rn"), col("k").as("s"))
      .join(ends.withColumn("rn", row_number().over(w))
        .select(col("rn"), col("k").as("e")), Seq("rn"))
      .select(col("s"), col("e")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = keys.map(x => x -> x).foldLeft(List.empty[(Long, Long)]) {
      case ((s, e) :: rest, (x, _)) if x == e + 1 => (s, x) :: rest
      case (acc, (x, _)) => (x, x) :: acc
    }.toSet
    assert(got == brute)
    assert(got == Set((1L, 3L), (5L, 5L), (7L, 8L), (100L, 103L), (200L, 200L)))
  }

  test("weighted median: running-weight threshold picks the hand-computed row") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // values 10,20,30 with weights 1,1,3: total 5, half-threshold hits at
    // running 3 → value 30 is the weighted median (unweighted would be 20)
    val x = Seq((10L, 1L), (20L, 1L), (30L, 3L)).toDF("c", "q")
      .withColumn("g", lit("x")).withColumn("ok", col("c")).withColumn("ln", lit(0))
    val wRun = Window.partitionBy(col("g")).orderBy(col("c"), col("ok"), col("ln"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val got = x.withColumn("running", sum(col("q")).over(wRun))
      .withColumn("total", sum(col("q")).over(Window.partitionBy(col("g"))))
      .filter(expr("2 * running >= total"))
      .groupBy(col("g")).agg(min(col("c")).as("m"))
      .head.getLong(1)
    assert(got == 30L)
    // all-equal weights degenerate to the plain lower-median rule
    val y = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)).toDF("c", "q")
      .withColumn("g", lit("x")).withColumn("ok", col("c")).withColumn("ln", lit(0))
    val gotY = y.withColumn("running", sum(col("q")).over(wRun))
      .withColumn("total", sum(col("q")).over(Window.partitionBy(col("g"))))
      .filter(expr("2 * running >= total"))
      .groupBy(col("g")).agg(min(col("c")).as("m")).head.getLong(1)
    assert(gotY == 2L) // running 2 of total 4 reaches the half at value 2
  }

  test("gini: two-phase bucket rank matches the closed form on a hand fixture") {
    import spark.implicits._
    // spends 1,2,3,4 (cents): G = Σ(2i−n−1)x_i / (nΣx_i) = (−3·1 −1·2 +1·3 +3·4)/(4·10) = 10/40
    val orders = Seq((1L, 0.01), (2L, 0.02), (3L, 0.03), (4L, 0.04))
      .toDF("o_custkey", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("gini").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Profiling.q178GiniConcentration(spark, dir).head
    assert(got.getLong(0) == 4L)
    assert(got.getLong(1) == 10L)
    assert(math.abs(got.getDouble(2) - 0.25) < 1e-12)
    // perfectly equal spends → gini exactly 0
    val eq = Seq((1L, 0.05), (2L, 0.05), (3L, 0.05), (4L, 0.05))
      .toDF("o_custkey", "o_totalprice")
    eq.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    assert(Profiling.q178GiniConcentration(spark, dir).head.getDouble(2) == 0.0)
  }

  test("sliding MAU: explode+distinct rewrite equals the brute-force range join") {
    import spark.implicits._
    val ud = Seq( // (user, day-index) activity
      (1L, 0), (1L, 3), (2L, 0), (2L, 10), (3L, 5), (3L, 6), (3L, 7))
      .toDF("user_id", "di")
      .select(col("user_id"),
        expr("timestamp_micros(cast(di as bigint) * 86400000000)").as("day"))
    val days = ud.select(col("day").as("wend")).distinct()
    val got = ud.select(col("user_id"),
        explode(sequence(col("day"), col("day") + expr("interval 6 days"))).as("wend"))
      .join(days, Seq("wend"), "left_semi")
      .groupBy(col("wend")).agg(countDistinct(col("user_id")).as("mau"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    ud.createOrReplaceTempView("mau_ud")
    val brute = spark.sql(
      """SELECT d.wend, count(DISTINCT u.user_id) AS mau
         FROM (SELECT DISTINCT day AS wend FROM mau_ud) d
         JOIN mau_ud u ON u.day BETWEEN d.wend - INTERVAL 6 DAY AND d.wend
         GROUP BY d.wend""")
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(got == brute)
    assert(got.size == 6) // 6 distinct observed days
  }
}
