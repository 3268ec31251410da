package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusOps, SplitOps}

/** Corpus governance audits against hand-computable fixtures. */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def split(k: Long): String = {
    val b = k % 1000003L * 2654435761L % 1000000007L % 10L
    if (b <= 7) "train" else if (b == 8) "val" else "test"
  }

  test("dup source matrix attributes near-dup pairs to unordered source pairs") {
    import spark.implicits._
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, dup, "en", "srcA", 60L), (2L, dup, "en", "srcB", 60L),
      (3L, other, "en", "srcB", 50L), (4L, other, "en", "srcB", 50L),
      (5L, "unique text with no twin anywhere in this corpus", "en", "srcC", 48L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = CorpusOps.dupSourceMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_pairs")).toMap
    assert(rows == Map(("srcA", "srcB") -> 1L, ("srcB", "srcB") -> 1L), s"got $rows")
    spark.catalog.clearCache()
  }

  test("split balance is near-zero for hash splits, large for a biased split") {
    import spark.implicits._
    // two sources interleaved over ids — the hash split can't see source
    val docs = (0L until 2000L)
      .map(i => (i, s"doc $i", "en", if (i % 2 == 0) "sA" else "sB", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = CorpusOps.splitBalance(docs).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("max_dev_bp")).toMap
    assert(rows.keySet == Set("train", "val", "test"))
    // corpus share is 5000bp each; a source-blind split stays within a few
    // hundred bp even on the 200-doc val split
    assert(rows.values.forall(_ <= 700L), s"hash split should be fair: $rows")
    // sanity: the audit's scale — per-split doc counts match the pure fn
    val expectVal = (0L until 2000L).count(split(_) == "val")
    val nVal = CorpusOps.splitBalance(docs).collect()
      .find(_.getString(0) == "val").get.getAs[Long]("n_docs")
    assert(nVal == expectVal)
  }

  test("boilerplate profile: repeated template shingles cross the df threshold") {
    import spark.implicits._
    val template = "all rights reserved by the site"  // 4 shingles, df = 25
    val docs = (1L to 25L).map(i =>
      (i, s"$template unique tail number$i extra word$i", "en", "web", 40L)) ++
      Seq((100L, "completely original essay words only here", "en", "book", 40L))
    val df = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = CorpusOps.boilerplate(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val web = rows("web")
    // the 6 shingles fully inside "... the site unique tail" have df=25
    // >= 20 -> boilerplate; shingles touching numberX/wordX are unique
    assert(web.getAs[Long]("n_boiler_shingles") == 6L, s"$web")
    assert(web.getAs[Long]("boiler_occ_bp") > 0L)
    val book = rows("book")
    assert(book.getAs[Long]("n_boiler_shingles") == 0L)
    assert(book.getAs[Long]("boiler_occ_bp") == 0L)
  }

  test("gram novelty attributes repetition to the later document") {
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon zeta eta theta"  // 6 shingles
    val docs = Seq(
      (1L, passage, "en", "orig", 48L),                 // first occurrence
      (5L, passage, "en", "copier", 48L),               // verbatim re-crawl
      (9L, "fresh words that nobody has ever written before now", "en", "copier", 50L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = CorpusOps.gramNovelty(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val orig = rows("orig")
    assert(orig.getAs[Long]("n_repeat") == 0L)
    assert(orig.getAs[Long]("novelty_bp") == 10000L)
    val cop = rows("copier")
    // doc 5's 6 shingles all first appeared in doc 1; doc 9's 7 are fresh
    assert(cop.getAs[Long]("n_grams") == 13L)
    assert(cop.getAs[Long]("n_repeat") == 6L)
    assert(cop.getAs[Long]("novelty_bp") == 7L * 10000L / 13L)
  }

  test("boilerplate survives a corpus with no doc reaching 3 tokens") {
    import spark.implicits._
    val df = Seq((1L, "two words", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(CorpusOps.boilerplate(df).collect().isEmpty)
  }
}
