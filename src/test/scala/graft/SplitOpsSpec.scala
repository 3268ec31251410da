package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SplitOps

/** Split assignment must be a pure function of the key (executor-agnostic,
  * rerun-stable) and the cluster-keyed scheme must provably never put the
  * two ends of a near-dup pair on opposite sides of the train/test wall.
  */
class SplitOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Scala-side mirror of the portable hash, for choosing fixture ids. */
  private def bucket(k: Long): Long = k % 1000003L * 2654435761L % 1000000007L % 10L
  private def split(k: Long): String =
    if (bucket(k) <= 7) "train" else if (bucket(k) == 8) "val" else "test"

  test("every doc lands in exactly one split; 0..999 covers all three") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, s"doc $i", i * 3))
      .toDF("doc_id", "text", "n_chars")
    val rows = SplitOps.splitAssign(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("train", "val", "test"))
    assert(rows.values.sum == 1000L, "partition: every doc in exactly one split")
    assert(rows("train") > rows("val") && rows("train") > rows("test"),
      s"8/1/1 weighting: $rows")
    // engine assignment == the documented pure function of the key
    val expectTrain = (0L until 1000L).count(split(_) == "train").toLong
    assert(rows("train") == expectTrain)
  }

  test("cluster-keyed split leaks zero near-dup pairs; naive split leaks") {
    import spark.implicits._
    // ids 1 (train) and 9 (val) straddle the wall under naive hashing;
    // ids 12 and 13 are both train. Identical texts -> minhash pairs.
    assert(split(1L) == "train" && split(9L) == "val")
    assert(split(12L) == "train" && split(13L) == "train")
    val dupText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, dupText, "s1", 60L), (9L, dupText, "s1", 60L),
      (12L, "one two three four five six seven eight nine ten", "s1", 50L),
      (13L, "one two three four five six seven eight nine ten", "s1", 50L),
      (20L, "lone document with its own unrelated words entirely", "s1", 52L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val r = SplitOps.splitLeakage(docs).collect().head
    assert(r.getAs[Long]("n_pairs") == 2L, s"two near-dup pairs: $r")
    assert(r.getAs[Long]("n_naive_cross") == 1L, s"(1,9) straddles: $r")
    assert(r.getAs[Long]("n_cluster_cross") == 0L,
      s"cluster-keyed split must never leak: $r")
    spark.catalog.clearCache()
  }

  test("leakage audit survives a dup-free corpus (zero pairs, one row)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "completely unique words here today", "s1", 30L),
      (2L, "nothing shared with any other text", "s1", 30L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val r = SplitOps.splitLeakage(docs).collect().head
    assert(r.getAs[Long]("n_pairs") == 0L)
    assert(r.getAs[Long]("n_naive_cross") == 0L)
    assert(r.getAs[Long]("n_cluster_cross") == 0L)
    spark.catalog.clearCache()
  }
}
