package graft.functions

import java.math.BigInteger
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Format-preserving encryption over decimal digit strings.
  *
  * Mirrors the reference's PAN tokenization (`pyffx.Integer(dek,
  * length=len(pan)).encrypt(int(pan))`, reference
  * dataflow_pipeline/pipeline.py:92-95): the token has exactly the same
  * length and alphabet (digits) as the input, and decrypt∘encrypt = id.
  *
  * Structure is an FF1-flavored alternating Feistel (NIST SP 800-38G
  * shape) with an HMAC-SHA256 round function — correctness is defined by
  * round-trip + format preservation, not bit-compatibility with pyffx
  * (the reference's key is random per deployment,
  * steps_to_create_key.sh:23-26, so no fixed vectors exist to match).
  *
  * The hot path (n ≤ 36 digits — every PAN) runs entirely in primitive
  * longs: each Feistel half is ≤ 18 digits, inside int64, so the round
  * loop does ten HMACs over a reusable 10-byte buffer into a reusable
  * 32-byte digest and ZERO heap allocation per round. The r6 shape
  * (BigInteger halves, `BigInteger.TEN.pow(n)` re-computed per round,
  * padded decimal strings re-encoded to UTF-8 as the PRF message) spent
  * most of its ~125µs/op constant on those allocations, not on SHA-256.
  * Inputs longer than 36 digits (never PANs; the property spec caps at
  * 24) fall back to the BigInteger path with the same schedule.
  *
  * TOKEN-FORMAT VERSION BREAK (round 7): the fast path changed the
  * Feistel PRF message encoding (10-byte binary (round, n, half) vs the
  * old padded-decimal UTF-8 string), so for every input ≤ 36 digits the
  * ciphertext for a given (key, pan) differs from releases before the
  * change. Round-trip and format preservation are unaffected — but FPE
  * tokens persisted by an earlier build will not match tokens minted by
  * this one. If cross-version token stability is ever needed, the old
  * encoding must come back behind a compat flag; nothing in this repo
  * persists tokens across versions (the driver re-derives every round).
  */
object Fpe {

  val Rounds = 10

  /** Per-thread (key, Mac, 10-byte message buf, 32-byte digest buf),
    * re-keyed only when the key bytes change. `Mac.getInstance` + `init`
    * per call would otherwise run 10-20× per row in the ingest hot path
    * (10 Feistel rounds, plus decrypt in the round-trip check);
    * `doFinal` resets the Mac so one instance serves every round and row
    * on a task thread, and `doFinal(out, 0)` writes the digest into the
    * reusable buffer instead of allocating 32 bytes per round.
    */
  private final class MacState(val key: Array[Byte]) {
    val mac: Mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    val msg = new Array[Byte](10)
    val digest = new Array[Byte](32)
  }

  private val macCache = new ThreadLocal[MacState]

  private def stateFor(key: Array[Byte]): MacState = {
    val cached = macCache.get()
    if (cached != null && java.util.Arrays.equals(cached.key, key)) cached
    else {
      val st = new MacState(key.clone())
      macCache.set(st)
      st
    }
  }

  /** PRF over (round, n, other-half value) → non-negative long. The
    * 8-byte big-endian value is an injective encoding of the half within
    * a fixed (round, n) context, so it keys the round exactly like the
    * padded decimal string did — just without building the string.
    */
  private def prfLong(st: MacState, round: Int, n: Int, v: Long): Long = {
    val m = st.msg
    m(0) = round.toByte; m(1) = n.toByte
    m(2) = (v >>> 56).toByte; m(3) = (v >>> 48).toByte
    m(4) = (v >>> 40).toByte; m(5) = (v >>> 32).toByte
    m(6) = (v >>> 24).toByte; m(7) = (v >>> 16).toByte
    m(8) = (v >>> 8).toByte; m(9) = v.toByte
    st.mac.update(m, 0, 10)
    st.mac.doFinal(st.digest, 0)
    val d = st.digest
    ((d(0) & 0x7fL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** 10^0 .. 10^18 — the largest power of ten inside int64. */
  private val Pow10 = Array.iterate(1L, 19)(_ * 10L)

  private def parseLong(s: String, from: Int, until: Int): Long = {
    var v = 0L; var i = from
    while (i < until) { v = v * 10 + (s.charAt(i) - '0'); i += 1 }
    v
  }

  private def appendPadded(sb: java.lang.StringBuilder, v: Long, width: Int): Unit = {
    var i = width - 1
    val start = sb.length
    sb.setLength(start + width)
    var x = v
    while (i >= 0) { sb.setCharAt(start + i, ('0' + (x % 10)).toChar); x /= 10; i -= 1 }
  }

  private def requireDigits(digits: String): Unit =
    require(digits.nonEmpty && digits.forall(_.isDigit),
      s"FPE input must be non-empty digits, got '$digits'")

  /** Alternating Feistel: even rounds re-key the left half from the right,
    * odd rounds the right from the left; inverse runs the schedule backwards
    * with subtraction. Primitive-long fast path for n ≤ 36.
    */
  private def feistelLong(key: Array[Byte], digits: String, forward: Boolean): String = {
    val st = stateFor(key)
    val n = digits.length
    val u = n / 2
    var a = if (u == 0) 0L else parseLong(digits, 0, u)
    var b = parseLong(digits, u, n)
    val modA = Pow10(u max 1)
    val modB = Pow10(n - u)
    var step = 0
    while (step < Rounds) {
      val i = if (forward) step else Rounds - 1 - step
      if (i % 2 == 0) {
        // u == 0 (single-digit input): the left half is not part of the
        // output, so mutating it would break invertibility — skip.
        if (u > 0) {
          val f = prfLong(st, i, n, b) % modA
          a = if (forward) (a + f) % modA else ((a - f) % modA + modA) % modA
        }
      } else {
        val f = prfLong(st, i, n, a) % modB
        b = if (forward) (b + f) % modB else ((b - f) % modB + modB) % modB
      }
      step += 1
    }
    val sb = new java.lang.StringBuilder(n)
    if (u > 0) appendPadded(sb, a, u)
    appendPadded(sb, b, n - u)
    sb.toString
  }

  // ---- BigInteger fallback for n > 36 (no PAN is; property spec caps at 24) ----

  private def prfBig(st: MacState, round: Int, n: Int, data: String): BigInteger = {
    val mac = st.mac
    mac.update(Array[Byte](round.toByte, n.toByte))
    new BigInteger(1, mac.doFinal(data.getBytes("UTF-8")))
  }

  private def pow10Big(n: Int): BigInteger = BigInteger.TEN.pow(n)

  private def pad(x: BigInteger, n: Int): String = {
    val s = x.toString
    "0" * (n - s.length) + s
  }

  private def feistelBig(key: Array[Byte], digits: String, forward: Boolean): String = {
    val st = stateFor(key)
    val n = digits.length
    val u = n / 2
    var a = new BigInteger(digits.substring(0, u max 1))
    var b = new BigInteger(digits.substring(u))
    if (u == 0) a = BigInteger.ZERO
    val modA = pow10Big(u max 1)
    val modB = pow10Big(n - u)
    val schedule = if (forward) 0 until Rounds else (Rounds - 1) to 0 by -1
    for (i <- schedule) {
      if (i % 2 == 0) {
        if (u > 0) {
          val f = prfBig(st, i, n, pad(b, n - u))
          a = if (forward) a.add(f).mod(modA) else a.subtract(f).mod(modA)
        }
      } else {
        val f = prfBig(st, i, n, pad(a, u max 1))
        b = if (forward) b.add(f).mod(modB) else b.subtract(f).mod(modB)
      }
    }
    (if (u == 0) "" else pad(a, u)) + pad(b, n - u)
  }

  private def feistel(key: Array[Byte], digits: String, forward: Boolean): String = {
    requireDigits(digits)
    if (digits.length <= 36) feistelLong(key, digits, forward)
    else feistelBig(key, digits, forward)
  }

  def encrypt(key: Array[Byte], digits: String): String = feistel(key, digits, forward = true)
  def decrypt(key: Array[Byte], digits: String): String = feistel(key, digits, forward = false)

  /** Encrypt + zfill(16) (pipeline.py:95) — the wire token shape. Called
    * from generated code (FpeEncryptExpression), hence on this object so
    * the static forwarder is directly invokable from Janino.
    */
  def encryptPadded(key: Array[Byte], digits: String): String = {
    val t = encrypt(key, digits)
    if (t.length >= 16) t else ("0" * (16 - t.length)) + t
  }
}
