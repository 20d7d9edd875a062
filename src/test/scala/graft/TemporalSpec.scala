package graft

import graft.operators.Temporal

import org.apache.spark.sql.functions._

/** Semantics of the temporal join operators on constructed inputs where the
  * expected answers are computed by hand (the DuckDB cross-check runs in the
  * driver's oracle gate; these pin the edge cases).
  */
class TemporalSpec extends SparkSuite {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin: latest prior wins, equal-ts visible, no-match is null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:10")), // after r2 → matches r2
      (2L, 10L, ts("2024-01-01 00:00:05")), // exactly at r2 → visible (>=)
      (3L, 10L, ts("2024-01-01 00:00:01")), // before any right → null
      (4L, 20L, ts("2024-01-01 00:00:30"))  // other key, matches r3
    ).toDF("lid", "k", "ts")
    val right = Seq(
      (101L, 10L, ts("2024-01-01 00:00:02"), 1.0), // r1
      (102L, 10L, ts("2024-01-01 00:00:05"), 2.0), // r2
      (103L, 20L, ts("2024-01-01 00:00:20"), 3.0)  // r3
    ).toDF("rid", "k", "ts", "v")
    val out = Temporal.asofJoin(left, right, "k", "ts",
        attach = Seq("rid" -> "rid", "v" -> "rv"), rightOrder = "rid")
      .orderBy("lid")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      (1L, Some(102L), Some(2.0)),
      (2L, Some(102L), Some(2.0)),
      (3L, None, None),
      (4L, Some(103L), Some(3.0))))
  }

  test("asofJoin: right-side ties on (key, ts) resolve to greatest rightOrder") {
    val left = Seq((1L, 5L, ts("2024-01-01 00:01:00"))).toDF("lid", "k", "ts")
    val right = Seq(
      (7L, 5L, ts("2024-01-01 00:00:30"), 1.0),
      (9L, 5L, ts("2024-01-01 00:00:30"), 2.0) // same ts, higher id → wins
    ).toDF("rid", "k", "ts", "v")
    val row = Temporal.asofJoin(left, right, "k", "ts",
      attach = Seq("rid" -> "rid", "v" -> "rv"), rightOrder = "rid").collect().head
    assert(row.getAs[Long]("rid") == 9L && row.getAs[Double]("rv") == 2.0)
  }

  test("asofJoin: attached columns are atomic (no tearing across right rows)") {
    // newer right row has a null attach column; a per-column last(ignoreNulls)
    // would steal that column from the older row — the struct must not
    val left = Seq((1L, 5L, ts("2024-01-01 00:01:00"))).toDF("lid", "k", "ts")
    val right = Seq(
      (7L, 5L, ts("2024-01-01 00:00:10"), Some(1.0)),
      (9L, 5L, ts("2024-01-01 00:00:30"), None: Option[Double])
    ).toDF("rid", "k", "ts", "v")
    val row = Temporal.asofJoin(left, right, "k", "ts",
      attach = Seq("rid" -> "rid", "v" -> "rv"), rightOrder = "rid").collect().head
    assert(row.getAs[Long]("rid") == 9L)
    assert(row.isNullAt(row.fieldIndex("rv")), "rv must come from row 9 (null), not row 7")
  }

  test("asofJoin: NULL keys and NULL right timestamps never match (SQL semantics)") {
    val left = Seq(
      (1L, Some(5L), Some(ts("2024-01-01 00:01:00"))),
      (2L, None: Option[Long], Some(ts("2024-01-01 00:01:00"))), // null key
      (3L, Some(5L), None: Option[java.sql.Timestamp])           // null ts
    ).toDF("lid", "k", "ts")
    val right = Seq(
      (7L, Some(5L), Some(ts("2024-01-01 00:00:30")), 1.0),
      (8L, None: Option[Long], Some(ts("2024-01-01 00:00:30")), 2.0), // null key: unmatchable
      (9L, Some(5L), None: Option[java.sql.Timestamp], 3.0)           // null ts: unmatchable
    ).toDF("rid", "k", "ts", "v")
    val out = Temporal.asofJoin(left, right, "k", "ts",
        attach = Seq("rid" -> "rid"), rightOrder = "rid")
      .orderBy("lid").collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
    assert(out.toSeq == Seq(
      1L -> Some(7L), // only the non-null right row matches
      2L -> None,     // null left key matches nothing (not even right rid=8)
      3L -> None))    // null left ts has no satisfiable bound
  }

  test("rangeJoinBucketed: inclusive lo, exclusive hi, multi-bucket spans") {
    val points = Seq((1L, 0.0), (2L, 49999.99), (3L, 50000.0), (4L, 125000.0))
      .toDF("pid", "v")
    val intervals = Seq((0, 0.0, 50000.0), (1, 50000.0, 150000.0))
      .toDF("band", "lo", "hi")
    val out = Temporal.rangeJoinBucketed(points, "v", intervals, "lo", "hi", 10000.0)
      .select("pid", "band").orderBy("pid").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq == Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)))
  }

  test("asofJoin: randomized differential vs brute force (ties, nulls, collisions)") {
    // the DuckDB oracle covers the fixture distribution; this covers random
    // shapes — heavy ts collisions, null keys/timestamps, empty partitions
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      def someTs() = ts(f"2024-01-01 00:0${rnd.nextInt(10)}%d:${rnd.nextInt(6) * 10}%02d")
      val left = (0 until 150).map { i =>
        (i.toLong,
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(5).toLong),
          if (rnd.nextInt(10) == 0) None else Some(someTs()))
      }
      val right = (0 until 150).map { i =>
        (1000L + i,
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(5).toLong),
          if (rnd.nextInt(10) == 0) None else Some(someTs()),
          rnd.nextInt(100).toDouble)
      }
      val expected: Map[Long, Option[Long]] = left.map { case (lid, k, lts) =>
        lid -> (for {
          kk <- k; lt <- lts
          best <- right
            .collect { case (rid, Some(rk), Some(rt), _) if rk == kk && !rt.after(lt) => (rt.getTime, rid) }
            .sorted.lastOption
        } yield best._2)
      }.toMap
      val out = Temporal.asofJoin(
          left.toDF("lid", "k", "ts"), right.toDF("rid", "k", "ts", "v"),
          "k", "ts", attach = Seq("rid" -> "rid"), rightOrder = "rid")
        .collect()
        .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      assert(out == expected, s"seed $seed mismatch")
    }
  }

  test("rangeJoinBucketed: randomized differential vs brute force (incl. negatives)") {
    for (seed <- Seq(7, 8)) {
      val rnd = new scala.util.Random(seed)
      val points = (0 until 300).map(i => (i.toLong, (rnd.nextDouble() - 0.5) * 2000))
      val intervals = (0 until 30).map { i =>
        val lo = (rnd.nextDouble() - 0.5) * 2000
        (i, lo, lo + rnd.nextDouble() * 300)
      }
      val expected = (for {
        (pid, v) <- points
        (band, lo, hi) <- intervals
        if v >= lo && v < hi
      } yield (pid, band)).toSet
      val out = Temporal.rangeJoinBucketed(
          points.toDF("pid", "v"), "v",
          intervals.toDF("band", "lo", "hi"), "lo", "hi", bucketWidth = 75.0)
        .select("pid", "band").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(out == expected, s"seed $seed mismatch")
    }
  }

  test("q71/q72 plans avoid the quadratic shapes") {
    val asofPlan = Temporal.q71AsofJoin(spark, sf).queryExecution.executedPlan.toString
    assert(!asofPlan.contains("CartesianProduct") && !asofPlan.contains("BroadcastNestedLoopJoin"),
      "as-of join must be union+window, not a pair join")
    assert(asofPlan.contains("Window"), "expected the ordered carry-forward window")
    val rangePlan = Temporal.q72RangeJoin(spark, sf).queryExecution.executedPlan.toString
    assert(rangePlan.contains("BroadcastHashJoin") || rangePlan.contains("SortMergeJoin"),
      "range join must equi-join on the bucket id")
    assert(!rangePlan.contains("BroadcastNestedLoopJoin"),
      "range join must not fall back to a nested loop")
  }
}
