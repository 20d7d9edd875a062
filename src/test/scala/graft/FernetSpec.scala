package graft

import graft.crypto.Fernet
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

class FernetSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("round-trip: decrypt(encrypt(x)) == x") {
    val f = new Fernet(Fernet.generateKey())
    for (msg <- Seq("", "hello", "John Doe", "ünïcødé ✓", "a" * 10000)) {
      assert(f.decryptString(f.encryptString(msg)) == msg)
    }
  }

  test("token differs from plaintext and between calls (random IV)") {
    val f = new Fernet(Fernet.generateKey())
    val t1 = f.encryptString("Ref1")
    val t2 = f.encryptString("Ref1")
    assert(t1 != "Ref1" && t2 != "Ref1" && t1 != t2)
    assert(f.decryptString(t1) == "Ref1" && f.decryptString(t2) == "Ref1")
  }

  test("spec test vector: token layout version 0x80, ts, iv, hmac verify") {
    // Generate at a pinned timestamp/IV and check structural invariants
    val f = new Fernet("AAECAwQFBgcICQoLDA0ODxAREhMUFRYXGBkaGxwdHh8=")
    val iv = Array.tabulate[Byte](16)(_.toByte)
    val tok = f.encryptAt("hello".getBytes(UTF_8), 499162800L, iv)
    val raw = java.util.Base64.getUrlDecoder.decode(tok)
    assert(raw(0) == 0x80.toByte)
    val ts = java.nio.ByteBuffer.wrap(raw.slice(1, 9)).getLong
    assert(ts == 499162800L)
    assert(raw.slice(9, 25).sameElements(iv))
    assert(new String(f.decrypt(tok), UTF_8) == "hello")
    // deterministic given same ts+iv
    assert(tok == f.encryptAt("hello".getBytes(UTF_8), 499162800L, iv))
    // byte-exact with the reference library's output at the same ts/IV
    // (python cryptography `Fernet._encrypt_from_parts(b'hello', 499162800, iv)`)
    assert(tok ==
      "gAAAAAAdwJ6wAAECAwQFBgcICQoLDA0OD4_9EBVfNSDZ7XtRxaHNdkW99QsUAt9pmRctkSzQxwX8ezo1JYkB0XAhlhuGaD6Beg==")
  }

  test("interop: decrypts a token produced by the reference's own library") {
    // token generated once with python `cryptography.fernet.Fernet` (the
    // exact library the reference uses, /root/reference/pipeline.py:13)
    // under the fixed test key — proves token-format compatibility
    val f = new Fernet("AAECAwQFBgcICQoLDA0ODxAREhMUFRYXGBkaGxwdHh8=")
    val pythonToken =
      "gAAAAABqfBZhZpipxb524TxouS5faYJmXy4DRAHcdRioZ_UXCpYr2VFODTy4T2_sjzCQd0TAt9N2cKWfJ0VACYreNNdAzGOe1w=="
    assert(f.decryptString(pythonToken) == "John Doe")
  }

  test("tampered token rejected") {
    val f = new Fernet(Fernet.generateKey())
    val tok = f.encryptString("secret")
    val raw = java.util.Base64.getUrlDecoder.decode(tok)
    raw(raw.length - 1) = (raw(raw.length - 1) ^ 1).toByte
    val bad = java.util.Base64.getUrlEncoder.encodeToString(raw)
    assertThrows[IllegalArgumentException](f.decrypt(bad))
  }

  test("wrong key rejected") {
    val f1 = new Fernet(Fernet.generateKey())
    val f2 = new Fernet(Fernet.generateKey())
    assertThrows[IllegalArgumentException](f2.decrypt(f1.encryptString("x")))
  }

  test("bad key length rejected") {
    assertThrows[IllegalArgumentException](new Fernet("AAAA").decrypt("x"))
  }

  // --- round-13 properties: the two public-spec behaviors not previously
  // pinned (single-byte tamper resistance across EVERY position; ttl +
  // clock-skew handling on the ttl-checked decrypt overload)

  test("property: EVERY single-byte flip anywhere in the token is rejected") {
    val f = new Fernet(Fernet.generateKey())
    // The HMAC covers version || ts || iv || ciphertext, and the tag itself
    // is compared in full — so no position and no bit may survive. The
    // column-level wrapper (CryptoFunctions.decryptWithKeyUdf) turns that
    // rejection into a null cell rather than a crashed scan — assert both.
    check(Prop.forAll(Gen.alphaNumStr, Gen.choose(0, Int.MaxValue),
      Gen.choose(1, 255)) { (msg, posSeed, xor) =>
      val tok = f.encryptString(msg)
      val raw = java.util.Base64.getUrlDecoder.decode(tok)
      val pos = posSeed % raw.length
      raw(pos) = (raw(pos) ^ xor).toByte
      val bad = java.util.Base64.getUrlEncoder.encodeToString(raw)
      val thrown = scala.util.Try(f.decrypt(bad)).isFailure
      val nulled = scala.util.Try(f.decryptString(bad)).toOption.orNull == null
      thrown && nulled
    })
  }

  test("property: ttl accepts exactly the tokens aged <= ttl") {
    val f = new Fernet(Fernet.generateKey())
    val iv = Array.tabulate[Byte](16)(_.toByte)
    val now = 1700000000L
    check(Prop.forAll(Gen.choose(0L, 100000L), Gen.choose(0L, 100000L)) {
      (ttl, age) =>
      val tok = f.encryptAt("x".getBytes(UTF_8), now - age, iv)
      val ok = scala.util.Try(f.decrypt(tok, ttl, now)).isSuccess
      ok == (age <= ttl)
    })
  }

  test("property: future timestamps tolerated only within the 60s clock skew") {
    val f = new Fernet(Fernet.generateKey())
    val iv = Array.tabulate[Byte](16)(_.toByte)
    val now = 1700000000L
    check(Prop.forAll(Gen.choose(0L, 10000L)) { skew =>
      val tok = f.encryptAt("x".getBytes(UTF_8), now + skew, iv)
      val ok = scala.util.Try(f.decrypt(tok, 3600L, now)).isSuccess
      ok == (skew <= Fernet.MaxClockSkewSec)
    })
  }

  test("property: ttl-less decrypt never expires, any age or skew") {
    val f = new Fernet(Fernet.generateKey())
    val iv = Array.tabulate[Byte](16)(_.toByte)
    // the reference library only applies ttl/skew checks when ttl is given;
    // a plain decrypt must accept a year-old or hour-early token unchanged
    check(Prop.forAll(Gen.choose(-1000000000L, 1000000000L)) { offset =>
      val tok = f.encryptAt("x".getBytes(UTF_8), 1700000000L + offset, iv)
      new String(f.decrypt(tok), UTF_8) == "x"
    })
  }
}
