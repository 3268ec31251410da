package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FeatureOps, Governance}

/** Edge-case pins for the ML-prep and governance-gate additions — the
  * oracle gate scores the corpus-level results; these pin the boundary
  * behaviors small data can't reach.
  */
class FeatureOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("target encoding: smoothing pulls small categories toward global") {
    // category a: 2/2 positive (tiny), category b: 50/100 positive (big)
    val rows = Seq.fill(2)(("a", 1L)) ++
      Seq.fill(50)(("b", 1L)) ++ Seq.fill(50)(("b", 0L))
    val cells = rows.toDF("category", "t")
      .groupBy("category").agg(count(lit(1)).as("n"), sum("t").as("sum_t"))
    val enc = FeatureOps.targetEncodeFromCells(cells).collect()
      .map(r => r.getString(0) -> r).toMap
    val globalPpm = (52L * 1000000L) / 102L
    assert(enc("a").getAs[Long]("global_ppm") == globalPpm)
    // raw rate for a is 1000000; the m=100 prior must drag it far toward
    // global (2 observations vs 100 pseudo-observations)
    val encA = enc("a").getAs[Long]("enc_ppm")
    assert(enc("a").getAs[Long]("raw_ppm") == 1000000L)
    assert(encA < 600000L && encA > globalPpm,
      s"smoothed a=$encA should sit between global $globalPpm and raw 1e6, near global")
    // b has n == m: exactly halfway between raw and global (integer DIV)
    val encB = enc("b").getAs[Long]("enc_ppm")
    assert(encB == (50L * 1000000L + 100L * globalPpm) / 200L)
  }

  test("feature hash buckets stay in [0, 64) and partition the vocabulary") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha alpha beta"))
      .toDF("doc_id", "text")
    val fh = FeatureOps.featureHash(docs).collect()
    assert(fh.forall(r => r.getAs[Long]("bucket") >= 0L &&
      r.getAs[Long]("bucket") < FeatureOps.HashBuckets))
    // occurrences total = 7 tokens; distinct terms total = 4
    assert(fh.map(_.getAs[Long]("n_tokens")).sum == 7L)
    assert(fh.map(_.getAs[Long]("n_terms")).sum == 4L)
    // a bucket's doc frequency can never exceed the corpus size
    assert(fh.forall(_.getAs[Long]("n_docs") <= 2L))
  }

  test("l-diversity: a k-large but homogeneous group fails the gate") {
    // group (1, X): 10 rows, all the same sensitive value — k-anonymous
    // at k=10 yet l=1; group (2, Y): 3 rows, 3 distinct values
    val cells = (Seq((1, "X", "p1", 10L)) ++
      Seq((2, "Y", "p1", 1L), (2, "Y", "p2", 1L), (2, "Y", "p3", 1L)))
      .toDF("c_nationkey", "c_mktsegment", "sens", "gn")
    val gate = Governance.lDiversityFromSensCells(cells).collect().head
    assert(gate.getAs[Long]("n_groups") == 2L)
    assert(gate.getAs[Long]("min_l") == 1L)
    assert(gate.getAs[Long]("n_weak_groups") == 1L)
    assert(gate.getAs[Long]("n_rows_at_risk") == 10L)
    assert(gate.getAs[Int]("l_diverse") == 0)
  }

  test("phrase search counts multiple adjacent occurrences at their first position") {
    val docs = Seq(
      (1L, "hash join beats hash join here"),   // 2 hits, first at pos 1
      (2L, "join hash no match"),               // reversed — no hit
      (3L, "x hash join y")                     // 1 hit at pos 2
    ).toDF("doc_id", "text")
    val hits = graft.operators.TextOps.phraseSearch(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(hits == Map(1L -> ((2L, 1L)), 3L -> ((1L, 2L))))
  }

  test("hapax stats: singleton bigrams counted per source") {
    val docs = Seq(
      ("s1", 1L, "a b a b"),   // bigrams: "a b","b a","a b" → "b a" hapax
      ("s1", 2L, "c d"),       // "c d" hapax
      ("s2", 3L, "e")          // <2 tokens → no bigrams
    ).toDF("source", "doc_id", "text")
    val h = graft.operators.TextOps.hapaxStats(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(h("s1").getAs[Long]("n_terms") == 3L)    // "a b","b a","c d"
    assert(h("s1").getAs[Long]("n_hapax") == 2L)    // "b a","c d"
    assert(h("s1").getAs[Long]("n_occurrences") == 4L)
    assert(!h.contains("s2"), "a source with no bigrams emits no row")
  }
}
