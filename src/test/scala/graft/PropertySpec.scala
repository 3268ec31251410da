package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fpe

/** Property-based invariants (SURVEY §5.2): the crypto and masking
  * kernels must hold for ALL inputs in their domains, not just the
  * fixture rows. Generators are driven with deterministic seeds (the
  * scalatest-scalacheck bridge artifact is not on the offline
  * classpath, so the sampling loop is explicit).
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val key = "property-spec-key-0123456789abcd".getBytes("UTF-8")
  private val digitStrings: Gen[String] = for {
    n <- Gen.choose(1, 24)
    ds <- Gen.listOfN(n, Gen.numChar)
  } yield ds.mkString

  private val pans: Gen[String] = for {
    n <- Gen.choose(13, 19)
    ds <- Gen.listOfN(n, Gen.numChar)
  } yield ds.mkString

  test("FPE: decrypt∘encrypt = id, format preserved, for all digit strings") {
    forAll(digitStrings) { d =>
      val t = Fpe.encrypt(key, d)
      assert(t.length == d.length)
      assert(t.forall(_.isDigit))
      assert(Fpe.decrypt(key, t) == d)
    }
  }

  test("FPE padded tokens: >= 16 digits, zfill inverts by original length") {
    forAll(pans) { pan =>
      val tok = Fpe.encryptPadded(key, pan)
      assert(tok.length == math.max(pan.length, 16))
      assert(tok.forall(_.isDigit))
      val raw = tok.substring(tok.length - pan.length)
      assert(Fpe.decrypt(key, raw) == pan)
    }
  }

  test("mask: first 6 + six asterisks + last 4, for all valid PAN lengths") {
    import org.apache.spark.sql.functions.col
    import graft.ingest.TxnPipeline
    val spark = SparkTestBase.spark
    import spark.implicits._
    forAll(Gen.listOfN(40, pans), n = 5) { ps =>
      val out = ps.toDF("pan")
        .select(col("pan"), TxnPipeline.maskPan(col("pan")).as("m"))
        .collect()
      assert(out.length == ps.length)
      out.foreach { r =>
        val (pan, m) = (r.getString(0), r.getString(1))
        assert(m == pan.take(6) + "******" + pan.takeRight(4))
        assert(m.length == 16) // fixed shape regardless of PAN length
      }
    }
  }
}
