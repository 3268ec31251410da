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
  */
object Fpe {

  val Rounds = 10

  /** Per-thread Mac instance, re-keyed only when the key bytes change.
    * `Mac.getInstance` + `init` per call would otherwise run 10-20× per
    * row in the ingest hot path (10 Feistel rounds, plus decrypt in the
    * round-trip check); `doFinal` resets the Mac so one instance serves
    * every round and row on a task thread.
    */
  private val macCache = new ThreadLocal[(Array[Byte], Mac)]

  private def macFor(key: Array[Byte]): Mac = {
    val cached = macCache.get()
    if (cached != null && java.util.Arrays.equals(cached._1, key)) cached._2
    else {
      val mac = Mac.getInstance("HmacSHA256")
      mac.init(new SecretKeySpec(key, "HmacSHA256"))
      macCache.set((key.clone(), mac))
      mac
    }
  }

  private def prf(key: Array[Byte], round: Int, n: Int, data: String): BigInteger = {
    val mac = macFor(key)
    mac.reset()
    mac.update(Array[Byte](round.toByte, n.toByte))
    val digest = mac.doFinal(data.getBytes("UTF-8"))
    new BigInteger(1, digest)
  }

  private def pow10(n: Int): BigInteger = BigInteger.TEN.pow(n)

  private def pad(x: BigInteger, n: Int): String = {
    val s = x.toString
    "0" * (n - s.length) + s
  }

  /** Alternating Feistel: even rounds re-key the left half from the right,
    * odd rounds the right from the left; inverse runs the schedule backwards
    * with subtraction.
    */
  private def feistel(key: Array[Byte], digits: String, forward: Boolean): String = {
    require(digits.nonEmpty && digits.forall(_.isDigit),
      s"FPE input must be non-empty digits, got '$digits'")
    val n = digits.length
    val u = n / 2
    var a = new BigInteger(digits.substring(0, u).reverse.padTo(1, '0').reverse.mkString)
    var b = new BigInteger(digits.substring(u))
    if (u == 0) a = BigInteger.ZERO
    val modA = pow10(u max 1)
    val modB = pow10(n - u)
    val schedule = if (forward) 0 until Rounds else (Rounds - 1) to 0 by -1
    for (i <- schedule) {
      if (i % 2 == 0) {
        // u == 0 (single-digit input): the left half is not part of the
        // output, so mutating it would break invertibility — skip.
        if (u > 0) {
          val f = prf(key, i, n, pad(b, n - u))
          a = if (forward) a.add(f).mod(modA) else a.subtract(f).mod(modA)
        }
      } else {
        val f = prf(key, i, n, pad(a, u max 1))
        b = if (forward) b.add(f).mod(modB) else b.subtract(f).mod(modB)
      }
    }
    (if (u == 0) "" else pad(a, u)) + pad(b, n - u)
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
