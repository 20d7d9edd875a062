package graft

import graft.crypto.Fernet
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

class FernetSpec extends AnyFunSuite {

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
}
