package graft.crypto

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.security.{MessageDigest, SecureRandom}
import java.util.Base64
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
import javax.crypto.{Cipher, Mac}

/** Fernet symmetric-token codec on `javax.crypto` only.
  *
  * Implements the public Fernet spec (github.com/fernet/spec): a 32-byte
  * urlsafe-base64 key whose first 16 bytes sign (HMAC-SHA256) and last 16
  * bytes encrypt (AES-128-CBC, PKCS7); token = base64url(0x80 || ts_be64 ||
  * iv16 || ciphertext || hmac32). Token-format-compatible with the
  * `cryptography` library the reference uses (/root/reference/pipeline.py:13,
  * 72-84), but unlike the reference — which discards the key at process exit,
  * making encryption one-way (SURVEY.md §0.2-4) — the key here is explicit so
  * round-trip decryption is possible and tested.
  */
final class Fernet(keyBase64: String) extends Serializable {
  @transient private lazy val keyBytes: Array[Byte] = Fernet.decodeB64Url(keyBase64)
  @transient private lazy val signingKey = new SecretKeySpec(keyBytes.slice(0, 16), "HmacSHA256")
  @transient private lazy val encryptionKey = new SecretKeySpec(keyBytes.slice(16, 32), "AES")
  @transient private lazy val random = new SecureRandom()
  // Cipher/Mac are NOT thread-safe but ARE reusable: a fresh
  // getInstance() per row was the dominant constant in the per-row
  // crypto queries (q27/q192 were the appendix's heaviest data-linear
  // rows). One instance per executor thread, re-init'd per call (init
  // is cheap; allocation + provider lookup is not).
  @transient private lazy val cipherTL =
    ThreadLocal.withInitial[Cipher](() => Cipher.getInstance("AES/CBC/PKCS5Padding"))
  @transient private lazy val macTL =
    ThreadLocal.withInitial[Mac](() => Mac.getInstance("HmacSHA256"))

  require(Fernet.decodeB64Url(keyBase64).length == 32,
    "Fernet key must be 32 bytes, urlsafe-base64 encoded")

  def encrypt(plaintext: Array[Byte]): String =
    encryptAt(plaintext, System.currentTimeMillis() / 1000L, nextIv())

  def encryptString(s: String): String = encrypt(s.getBytes(UTF_8))

  /** Deterministic variant (fixed timestamp + IV) — used by tests to pin
    * token bytes against the spec's structure.
    */
  private[graft] def encryptAt(plaintext: Array[Byte], timestampSec: Long, iv: Array[Byte]): String = {
    val cipher = cipherTL.get()
    cipher.init(Cipher.ENCRYPT_MODE, encryptionKey, new IvParameterSpec(iv))
    val ciphertext = cipher.doFinal(plaintext)
    val body = ByteBuffer.allocate(1 + 8 + 16 + ciphertext.length)
      .put(0x80.toByte).putLong(timestampSec).put(iv).put(ciphertext).array()
    val mac = macTL.get()
    mac.init(signingKey)
    val tag = mac.doFinal(body)
    Fernet.encodeB64Url(body ++ tag)
  }

  /** Decrypt and verify a token; throws IllegalArgumentException on any
    * malformed/forged token (wrong version, bad HMAC, bad padding).
    */
  def decrypt(token: String): Array[Byte] = {
    val raw = Fernet.decodeB64Url(token)
    require(raw.length >= 1 + 8 + 16 + 16 + 32, "Fernet token too short")
    require(raw(0) == 0x80.toByte, "Unsupported Fernet token version")
    val body = raw.slice(0, raw.length - 32)
    val tag = raw.slice(raw.length - 32, raw.length)
    val mac = macTL.get()
    mac.init(signingKey)
    val expected = mac.doFinal(body)
    require(MessageDigest.isEqual(expected, tag), "Fernet HMAC verification failed")
    val iv = raw.slice(9, 25)
    val ciphertext = raw.slice(25, raw.length - 32)
    val cipher = cipherTL.get()
    cipher.init(Cipher.DECRYPT_MODE, encryptionKey, new IvParameterSpec(iv))
    cipher.doFinal(ciphertext)
  }

  def decryptString(token: String): String = new String(decrypt(token), UTF_8)

  /** Decrypt with time-to-live enforcement — the public-spec behavior of
    * `cryptography.fernet.Fernet.decrypt(token, ttl=...)`: after HMAC
    * verification (never before — expiry decisions must not run on
    * unauthenticated bytes), reject a token whose embedded timestamp is
    * older than `ttlSec` before `nowSec`, and reject one stamped more
    * than [[Fernet.MaxClockSkewSec]] (60 s, the reference library's
    * `_MAX_CLOCK_SKEW`) in the FUTURE of `nowSec` — a skewed writer
    * clock must not mint tokens that outlive their ttl. Both checks
    * apply only on this overload, matching the reference library:
    * ttl-less `decrypt(token)` never expires. `nowSec` is injectable so
    * expiry and skew are testable without sleeping.
    */
  def decrypt(token: String, ttlSec: Long, nowSec: Long): Array[Byte] = {
    val plaintext = decrypt(token) // full parse + HMAC verify first
    val ts = timestamp(token)
    require(ts + ttlSec >= nowSec, "Fernet token expired")
    require(ts <= nowSec + Fernet.MaxClockSkewSec,
      "Fernet token timestamp too far in the future")
    plaintext
  }

  def decrypt(token: String, ttlSec: Long): Array[Byte] =
    decrypt(token, ttlSec, System.currentTimeMillis() / 1000L)

  /** The token's embedded creation time (seconds since epoch). Parse-only —
    * callers that act on it must have verified the token (decrypt does).
    */
  private[graft] def timestamp(token: String): Long = {
    val raw = Fernet.decodeB64Url(token)
    require(raw.length >= 9, "Fernet token too short")
    ByteBuffer.wrap(raw.slice(1, 9)).getLong
  }

  private def nextIv(): Array[Byte] = {
    val iv = new Array[Byte](16)
    random.nextBytes(iv)
    iv
  }
}

object Fernet {
  /** Maximum tolerated FUTURE skew of a token's timestamp during
    * ttl-checked decrypts — the public spec's 60 s (`_MAX_CLOCK_SKEW` in
    * the reference's `cryptography` library).
    */
  val MaxClockSkewSec: Long = 60L

  /** Fresh random 32-byte key, urlsafe-base64 — parity with
    * `Fernet.generate_key()` (/root/reference/pipeline.py:72).
    */
  def generateKey(): String = {
    val bytes = new Array[Byte](32)
    new SecureRandom().nextBytes(bytes)
    encodeB64Url(bytes)
  }

  /** Deterministic key derivation from a seed string (SHA-256 → 32 bytes →
    * urlsafe-base64). For per-subject key tables this makes key PROVISIONING
    * reproducible from a master secret + subject id; shredding then deletes
    * the derived row (and, in a real deployment, rotates the master).
    */
  def deriveKey(seed: String): String =
    encodeB64Url(java.security.MessageDigest.getInstance("SHA-256")
      .digest(seed.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  private[crypto] def encodeB64Url(b: Array[Byte]): String =
    Base64.getUrlEncoder.encodeToString(b)

  private[crypto] def decodeB64Url(s: String): Array[Byte] =
    Base64.getUrlDecoder.decode(s.trim)
}
