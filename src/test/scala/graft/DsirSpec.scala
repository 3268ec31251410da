package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusOps, TextOps}

/** Invariants of the DSIR importance-weight and tokenizer-fertility
  * audits that hold for ANY corpus, beyond the oracle-pinned fixtures.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("dsir: target-domain documents outscore the pool") {
    val docs = Tables.documents(spark, dir)
    val w = CorpusOps.dsirWeights(docs)
      .withColumn("is_target", col("source") === CorpusOps.DsirTarget)
      .groupBy(col("is_target"))
      .agg(count(lit(1)).as("n"),
        avg(col("logw_bits")).as("avg_w"),
        (sum(col("selected")).cast("double") / count(lit(1))).as("sel_rate"))
      .collect().map(r => r.getBoolean(0) -> r).toMap
    assert(w.contains(true) && w.contains(false))
    // the method's defining property: features drawn from the target
    // distribution rank above the pool under the estimated log-ratio
    assert(w(true).getDouble(2) > w(false).getDouble(2),
      "target docs must average a higher importance weight than the pool")
    assert(w(true).getDouble(3) > w(false).getDouble(3),
      "selection rate must favor the target domain")
  }

  test("dsir: every document with >= 3 tokens is scored exactly once") {
    val docs = Tables.documents(spark, dir)
    val scored = CorpusOps.dsirWeights(docs)
    val expected = docs
      .filter(size(split(col("text"), " ")) >= 3).count()
    assert(scored.count() == expected)
    assert(scored.select(col("doc_id")).distinct().count() == expected,
      "per-doc aggregate must emit one row per document")
  }

  test("stream dsir: bounded bucket state that conserves gram mass") {
    val docs = Tables.documents(spark, dir)
    val out = graft.streaming.StreamQueries.streamDsir(spark, dir).collect()
    assert(out.length <= CorpusOps.DsirBuckets,
      "streaming state must stay within the fixed feature dimension")
    out.foreach { r =>
      val b = r.getLong(0)
      assert(b >= 0 && b < CorpusOps.DsirBuckets, s"bucket out of range: $r")
      assert(r.getLong(3) == r.getLong(1) * r.getLong(2), s"w_bits mismatch: $r")
    }
    val streamed = out.map(_.getLong(1)).sum
    val batch = docs.select(
        explode(graft.functions.TrigramHashesExpression
          .trigramHashesAll(col("text"))).as("sh"))
      .count()
    assert(streamed == batch,
      "full-corpus replay must conserve total gram occurrences")
  }

  test("fertility: one row per (source, lang) slice with conserved sums") {
    val docs = Tables.documents(spark, dir)
    val f = TextOps.tokenizerFertility(docs)
    val slices = docs.select(col("source"), col("lang")).distinct().count()
    assert(f.count() == slices)
    val tot = f.agg(sum(col("n_docs")).as("d"), sum(col("n_chars")).as("c"))
      .collect().head
    assert(tot.getLong(0) == docs.count(), "doc counts must conserve")
    assert(tot.getLong(1) ==
      docs.agg(sum(col("n_chars"))).collect().head.getLong(0),
      "char totals must conserve")
    f.collect().foreach { r =>
      val (ws, bpe) = (r.getLong(3), r.getLong(4))
      assert(ws > 0 && bpe > 0, s"non-empty slice with zero tokens: $r")
      assert(!r.isNullAt(6) && r.getLong(6) > 0, s"null fertility: $r")
    }
  }
}
