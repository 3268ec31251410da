package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Phash

class PhashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("every re-upload sibling pair is caught, at hamming <= 1") {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.count()
    val pairs = Phash.phashPairs(spark, docs).cache()
    // siblings (2k, 2k+1) share the test card; the odd twin's one-pixel
    // edit can flip at most the single dHash bit whose comparison spans
    // sample (0,0)
    val sib = pairs.filter(col("d1") % 2 === 0 && col("d2") === col("d1") + 1)
    assert(sib.count() == nDocs / 2, "a planted re-upload pair was missed")
    assert(sib.filter(col("hamming") > 1).count() == 0,
      "one-pixel edit flipped more than one dHash bit")
    spark.catalog.clearCache()
  }
}
