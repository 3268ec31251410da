package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fpe

/** FPE invariants per SURVEY.md §5: round-trip identity, format/length
  * preservation, determinism, key separation — across the full PAN length
  * range the validator admits (13..19) and beyond (property-style over a
  * seeded sample).
  */
class FpeSpec extends AnyFunSuite {
  private val key = "0123456789abcdef0123456789abcdef".getBytes("UTF-8")
  private val key2 = "fedcba9876543210fedcba9876543210".getBytes("UTF-8")

  private val rnd = new scala.util.Random(42)
  private def randomDigits(n: Int): String =
    (0 until n).map(_ => ('0' + rnd.nextInt(10)).toChar).mkString
  private val sample: Seq[String] =
    (1 to 24).flatMap(n => (0 until 50).map(_ => randomDigits(n)))

  test("round-trip identity for all digit strings (lengths 1..24)") {
    sample.foreach { pan =>
      assert(Fpe.decrypt(key, Fpe.encrypt(key, pan)) == pan, s"pan=$pan")
    }
  }

  test("format and length preservation") {
    sample.foreach { pan =>
      val t = Fpe.encrypt(key, pan)
      assert(t.length == pan.length, s"pan=$pan token=$t")
      assert(t.forall(_.isDigit), s"pan=$pan token=$t")
    }
  }

  test("deterministic per key; keys separate") {
    val pan = "4556737586899855"
    assert(Fpe.encrypt(key, pan) == Fpe.encrypt(key, pan))
    assert(Fpe.encrypt(key, pan) != Fpe.encrypt(key2, pan))
    assert(Fpe.encrypt(key, pan) != pan)
  }

  test("tokens differ across inputs (injective on a sample)") {
    val pans = (0 until 1000).map(i => f"4556737586$i%06d")
    val tokens = pans.map(Fpe.encrypt(key, _))
    assert(tokens.distinct.size == pans.size)
  }

  test("rejects non-digit input") {
    intercept[IllegalArgumentException](Fpe.encrypt(key, "4111x111"))
    intercept[IllegalArgumentException](Fpe.encrypt(key, ""))
  }
}
