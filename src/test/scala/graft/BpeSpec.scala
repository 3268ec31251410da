package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{BpeFunctions, BpeMerges}

/** Pins the BPE merge contract (sequential per-rule greedy folds) on
  * known words, and checks the kernel against hand-derived counts. The
  * table itself is arbitrary-but-fixed; what matters is that kernel and
  * oracle implement the SAME pass order (q_text_bpe_merges hash-checks
  * that cross-engine).
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def count(text: String): Long = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(BpeFunctions.bpeTokenCount(col("text")).as("n"))
      .collect().head.getLong(0)
  }

  test("chained merges collapse common words to one symbol") {
    assert(count("the") == 1L)   // t+h -> th, th+e -> the
    assert(count("for") == 1L)   // o+r -> or, f+or -> for
    assert(count("and") == 1L)   // a+n -> an, an+d -> and
  }

  test("rule order is observable: earlier rule consumes the pair") {
    // i-o-n: (o,n) fires before (i,o)/(io,n) ever see the chars -> i|on
    assert(count("ion") == 2L)
    // t-h-e-r: the (r2) then the+r (r50) -> 1 symbol
    assert(count("ther") == 1L)
  }

  test("greedy left fold within one rule is non-overlapping") {
    // (t,h): t h t h -> th th; unmerged odd tail stays
    assert(count("thth") == 2L)
    assert(count("ththt") == 3L)
  }

  test("pre-tokenizer splits words, digits, and marks before merging") {
    // "the cat, 42" -> [the]=1, [cat]=2 (c|at), [,]=1, [42]=2 (no digit rules)
    assert(count("the cat, 42") == 1L + 2L + 1L + 2L)
    assert(count("") == 0L)
  }

  test("merge table is well-formed: every part is a base char or an earlier product") {
    val produced = scala.collection.mutable.Set[String]()
    BpeMerges.Merges.foreach { case (a, b) =>
      Seq(a, b).foreach { part =>
        assert(part.length == 1 || produced.contains(part),
          s"rule part '$part' is multi-char but no earlier rule produces it")
      }
      produced += (a + b)
    }
  }
}
