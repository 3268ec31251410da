package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.VectorAggregates

/** The native vector-sum aggregate (§2.9 UDAF surface) must agree with
  * the per-component algebra across real partial/merge boundaries —
  * many input partitions force map-side partials plus serialized buffer
  * merges, the path a single-partition test would skip.
  */
class VectorAggregatesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("element-wise sums across many partitions equal the direct algebra") {
    import spark.implicits._
    val dim = 5
    // 1000 rows over 16 partitions: vec i = [i, 2i, 3i, 4i, 5i], grouped odd/even
    val df = spark.range(0, 1000).repartition(16)
      .select((col("id") % 2).as("k"),
        expr("transform(sequence(1, 5), j -> j * id)").as("v"))
    val out = df.groupBy(col("k"))
      .agg(VectorAggregates.vecSumLong(col("v"), dim).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val evens = (0L until 1000L by 2).sum
    val odds = (1L until 1000L by 2).sum
    assert(out(0L) == (1 to 5).map(_ * evens))
    assert(out(1L) == (1 to 5).map(_ * odds))
  }

  test("null inputs are skipped; a wrong-width array fails LOUDLY") {
    import spark.implicits._
    val ok = Seq(
      (1L, Some(Seq(1L, 2L, 3L))),
      (1L, None),
      (1L, Some(Seq(10L, 20L, 30L)))
    ).toDF("k", "v")
    val out = ok.groupBy(col("k"))
      .agg(VectorAggregates.vecSumLong(col("v"), 3).as("s"))
      .collect().head.getSeq[Long](1)
    assert(out == Seq(11L, 22L, 33L))
    // silently skipping a mis-sized vector would zero whole groups
    // (k-means would freeze at its seeds with no error) — it must throw
    val bad = Seq((1L, Seq(9L))).toDF("k", "v")
    val e = intercept[Exception] {
      bad.groupBy(col("k"))
        .agg(VectorAggregates.vecSumLong(col("v"), 3).as("s")).collect()
    }
    assert(e.getMessage.contains("vec_sum_long") ||
      Option(e.getCause).exists(_.getMessage.contains("vec_sum_long")))
  }
}
