package graft

import graft.operators._

import org.apache.spark.sql.functions._

/** Round-5 adversarial fixtures for the late-round operators: the
  * block-boundary pair q98's prefix blocking cannot see, checksum
  * SENSITIVITY for the reconciliation audit (agreement alone proves
  * nothing if the checksum never changes), and a hand-computed BPE merge.
  */
class Round5dSpec extends SparkSuite {

  test("sorted-neighborhood catches the cross-block pair prefix blocking misses") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // names differ ONLY at position 16 (0-indexed 15): identical 15-char
    // prefix + one edit. 16-char-prefix blocks put them in DIFFERENT
    // blocks, so q98's blocked join can never pair them; in name order
    // they are adjacent, so the w=3 sorted neighborhood must.
    val rows = Seq(
      (1L, "AAAAAAAAAAAAAAAXB"), // block AAAAAAAAAAAAAAAX
      (2L, "AAAAAAAAAAAAAAAYB"), // block AAAAAAAAAAAAAAAY — lev dist 1 from row 1
      (3L, "ZZZZZZZZZZZZZZZZZ")
    ).toDF("c_custkey", "c_name")
    // prefix blocking finds nothing
    val blocked = Linkage.fuzzySelfJoin(rows, "c_custkey", "c_name",
      blockPrefixLen = 16, maxDist = 1)
    assert(blocked.count() == 0)
    // sorted neighborhood (the q199 shape, inlined on the fixture) finds the pair
    val c = rows.select(col("c_custkey").as("id"), col("c_name").as("name"))
    val ranked = c.withColumn("gr",
      row_number().over(Window.orderBy(col("name"), col("id"))))
    val got = ranked.select(col("id").as("id_a"), col("name").as("name_a"),
        explode(array(col("gr") + 1, col("gr") + 2)).as("gr"))
      .join(ranked, Seq("gr"))
      .filter(levenshtein(col("name_a"), col("name")) <= 1)
      .select(col("id_a"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("reconciliation checksum is SENSITIVE: one flipped row breaks agreement") {
    import spark.implicits._
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(expr(
          """CAST(conv(substring(md5(concat_ws('|',
             CAST(n_nationkey AS STRING), n_name,
             CAST(n_regionkey AS STRING))), 1, 15), 16, 10) AS BIGINT)""").as("rh"))
        .agg(expr("cast(sum(cast(rh as decimal(38,0))) % 1000000000000000000 as bigint)"))
        .head.getLong(0)
    val base = Seq((1, "ALPHA", 0), (2, "BETA", 1), (3, "GAMMA", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val truncated = Seq((1, "ALPHA", 0), (2, "BET", 1), (3, "GAMMA", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey") // one char lost in transit
    val coerced = Seq((1, "ALPHA", 0), (2, "BETA", 1), (3, "GAMMA", 20))
      .toDF("n_nationkey", "n_name", "n_regionkey") // one value coerced
    assert(checksum(base) == checksum(base))
    assert(checksum(base) != checksum(truncated))
    assert(checksum(base) != checksum(coerced))
  }

  test("BPE merge is TRUE greedy left-to-right, not alternating-replace") {
    import spark.implicits._
    // "abab"×3 + "abc"×1: (a,b) weighted 2·3+1 = 7 wins; after the merge
    // "a b a b" must be "ab ab" (a naive single-pass string replace yields
    // "ab a b" — the trap this test pins), and the next top pair is
    // (ab, ab) with count 3.
    val vocab = Seq(("a b a b", 3L), ("a b c", 1L)).toDF("seq", "n")
    val t0 = TextAnalysis.bpeTopPair(vocab).head
    assert((t0.getString(0), t0.getString(1), t0.getLong(2)) == ("a", "b", 7L))
    val merged = TextAnalysis.bpeMergeStep(vocab, TextAnalysis.bpeTopPair(vocab))
    assert(merged.collect().map(_.getString(0)).toSet == Set("ab ab", "ab c"))
    val t1 = TextAnalysis.bpeTopPair(merged).head
    assert((t1.getString(0), t1.getString(1), t1.getLong(2)) == ("ab", "ab", 3L))
    // run semantics: six a's under (a,a) merge to exactly "aa aa aa"
    val run = Seq(("a a a a a a", 1L)).toDF("seq", "n")
    val runTop = run.sparkSession.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row("a", "a", 5L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("w1", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("w2", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType))))
    val runMerged = TextAnalysis.bpeMergeStep(run, runTop)
    assert(runMerged.head.getString(0) == "aa aa aa")
  }
}
