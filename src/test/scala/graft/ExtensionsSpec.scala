package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-only route: a session built with
  * spark.sql.extensions=graft.functions.GraftExtensions can call every
  * graft function from SQL text with no Scala API involvement.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("graft functions resolve in pure SQL via SparkSessionExtensions") {
    // extensions are builder-time configuration, and getOrCreate returns any
    // existing default session — clear it (restored below) so this builder
    // actually constructs a session with the extensions applied
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // `.config("spark.sql.extensions", ...)` is the spark-submit route, but
    // it's a STATIC conf — silently ignored when a SparkContext already
    // exists (as it does under the shared test harness) — so the builder
    // API carries the extensions here
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val sim = spark.sql(
        "SELECT graft_simhash64(array('spark', 'native', 'engine')) AS fp").collect()(0).getLong(0)
      assert(sim != 0L)
      val sig = spark.sql(
        "SELECT graft_minhash_signature(array('a b c', 'b c d'), 8) AS s").collect()(0)
        .getSeq[Long](0)
      assert(sig.length == 8)
      val cos = spark.sql(
        "SELECT graft_cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
        .collect()(0).getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      val buckets = spark.sql(
        "SELECT graft_lsh_buckets(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 4, 8) AS b")
        .collect()(0).getSeq[Long](0)
      assert(buckets.length == 4)
      val shingles = spark.sql(
        "SELECT graft_shingle_hashes(array('a', 'b', 'c', 'd'), 3) AS sh")
        .collect()(0).getSeq[Long](0)
      assert(shingles.length == 2) // two 3-token windows
      val mh = spark.sql(
        "SELECT graft_minhash_from_hashes(array(1L, 2L, 3L), 16) AS m")
        .collect()(0).getSeq[Long](0)
      assert(mh.length == 16)
      // sketch round-trip: build with the Spark aggregate, probe with ours
      val est = spark.sql(
        """SELECT graft_cms_estimate(
             count_min_sketch(x, 0.001d, 0.999d, 1), 7L) AS e
           FROM (SELECT explode(array(7L, 7L, 7L, 5L)) AS x)""")
        .collect()(0).getLong(0)
      assert(est >= 3L, s"CMS estimate $est must be >= true count 3")
      val foldedStr = spark.sql(
        "SELECT graft_fold_accents('Café Zürich') AS f").collect()(0).getString(0)
      assert(foldedStr == "Cafe Zurich")
      val bpe = spark.sql(
        "SELECT graft_bpe_token_count('ab1 cd!é') AS n").collect()(0).getLong(0)
      assert(bpe == 5L) // 'ab' '1' 'cd' '!' 'é'
      val ws = spark.sql(
        "SELECT graft_ws_token_count('a  b c') AS n").collect()(0).getLong(0)
      assert(ws == 4L) // split keeps the empty middle field
      // size parameters must be literals — a column reference gets a clear
      // error naming the function, not a ClassCastException
      val err = intercept[Exception] {
        spark.sql(
          "SELECT graft_shingle_hashes(array('a','b'), id) FROM range(1)").collect()
      }
      assert(err.getMessage.contains("graft_shingle_hashes"), err.getMessage)
      // long literals coerce instead of ClassCastException
      val viaLong = spark.sql(
        "SELECT graft_minhash_from_hashes(array(1L, 2L), 8L) AS m")
        .collect()(0).getSeq[Long](0)
      assert(viaLong.length == 8)
      // identical values to the Scala-API registration path
      val viaApi = graft.functions.GraftFunctions
        .simhash64(spark, org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit("spark"),
          org.apache.spark.sql.functions.lit("native"),
          org.apache.spark.sql.functions.lit("engine")))
      val apiVal = spark.range(1).select(viaApi.as("fp")).collect()(0).getLong(0)
      assert(apiVal == sim)
    } finally {
      // do not stop() — that would kill the SparkContext shared with the
      // other suites; restore the previous default/active sessions instead
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
