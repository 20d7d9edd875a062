package graft

import graft.crypto.{CryptoFunctions, Fernet}
import org.apache.spark.sql.functions.col

/** DataFrame-level twin of the reference's `test_encrypt_data`
  * (/root/reference/tests/test_pipeline.py:20-31): same 2×2 fixture, encrypt
  * `Referee`, assert both cells changed and `Name` untouched — plus the
  * round-trip the reference cannot assert (key discarded, pipeline.py:72-73).
  */
class CryptoColumnsSpec extends SparkSuite {
  import org.apache.spark.sql.Row

  private val key = Fernet.generateKey()

  private def fixture = {
    import spark.implicits._
    Seq(("John Doe", "Ref1"), ("Jane Doe", "Ref2")).toDF("Name", "Referee")
  }

  test("encrypt targeted column, leave others untouched (reference fixture)") {
    val out = CryptoFunctions.encryptColumns(fixture, Seq("Referee"), key).collect()
    val orig = fixture.collect()
    assert(out.map(_.getString(0)).toSeq == orig.map(_.getString(0)).toSeq) // Name untouched
    out.map(_.getString(1)).zip(Seq("Ref1", "Ref2")).foreach { case (enc, plain) =>
      assert(enc != plain)
    }
  }

  test("missing column is warn-and-skip, not error (reference parity)") {
    val out = CryptoFunctions.encryptColumns(fixture, Seq("not_here"), key)
    assert(out.collect().toSeq == fixture.collect().toSeq)
  }

  test("round-trip through DataFrame UDFs") {
    val enc = CryptoFunctions.encryptColumns(fixture, Seq("Referee"), key)
    val dec = CryptoFunctions.decryptColumns(enc, Seq("Referee"), key)
    assert(dec.collect().toSeq == fixture.collect().toSeq)
  }

  test("null cells pass through as null") {
    import spark.implicits._
    val df = Seq(("a", Option("x")), ("b", None)).toDF("k", "v")
    val enc = CryptoFunctions.encryptColumns(df, Seq("v"), key)
    val rows = enc.orderBy(col("k")).collect()
    assert(rows(0).getString(1) != "x" && rows(1).isNullAt(1))
  }

  test("token is Fernet-format compatible (decryptable by plain codec)") {
    val enc = CryptoFunctions.encryptColumns(fixture, Seq("Referee"), key)
    val token = enc.collect()(0).getString(1)
    assert(new Fernet(key).decryptString(token) == "Ref1")
  }
}
