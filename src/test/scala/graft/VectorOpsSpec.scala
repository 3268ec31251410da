package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** LSH sizing-dial invariants (the bench/oracle behavior of the vector
  * operators themselves is covered by the q_emb_* oracle rows).
  */
class VectorOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("bitsForCorpusSize: +1 bit per corpus doubling, floored at 4") {
    assert(VectorOps.bitsForCorpusSize(1L) == 4)
    assert(VectorOps.bitsForCorpusSize(32L) == 4)
    assert(VectorOps.bitsForCorpusSize(2048L) == 6)
    assert(VectorOps.bitsForCorpusSize(4096L) == 7)
    // doubling the corpus adds exactly one bit once past the floor
    (12 to 40).foreach { k =>
      val n = 1L << k
      assert(VectorOps.bitsForCorpusSize(2 * n) ==
        VectorOps.bitsForCorpusSize(n) + 1)
    }
  }

  test("semDedupDrops honors the threshold and never crosses cells") {
    val emb = Tables.embeddings(spark, dir)
    val drops = VectorOps.semDedupDrops(emb).cache()
    assert(drops.filter(col("max_cosine") < VectorOps.SemDedupMinCosine).count() == 0)
    // a dropped vector's reported cell must be its OWN IVF assignment —
    // i.e. candidate pairs were generated strictly within cells
    val asg = VectorOps.ivfAssign(emb)
      .select(col("vec_id").as("drop_vec_id"), col("centroid_id").as("own_cid"))
    val crossed = drops.join(asg, "drop_vec_id")
      .filter(col("centroid_id") =!= col("own_cid")).count()
    assert(crossed == 0, "semdedup pair crossed a k-means cell")
    spark.catalog.clearCache()
  }

  test("lshBuckets honors the bits dial: bucket ids stay under 2^bits") {
    val emb = Tables.embeddings(spark, dir)
    val narrow = VectorOps.lshBuckets(emb, bits = 4)
    val wide = VectorOps.lshBuckets(emb)
    (0 until VectorOps.NTables).foreach { t =>
      assert(narrow.filter(col(s"bucket_$t") >= (1 << 4)).count() == 0)
      assert(wide.filter(col(s"bucket_$t") >= (1 << VectorOps.BitsPerTable)).count() == 0)
    }
    // narrower tables never partition finer than wider ones. (>= not >:
    // a tiny or clustered corpus can legitimately occupy <= 16 distinct
    // buckets even at 10 bits, so strict inequality is corpus-dependent.)
    val nNarrow = narrow.select("bucket_0").distinct().count()
    val nWide = wide.select("bucket_0").distinct().count()
    assert(nNarrow <= 16 && nWide >= nNarrow)
  }
}
