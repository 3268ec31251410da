package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.AuditOps

class AuditOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("fkIntegrity counts an injected orphan exactly once per edge invariant") {
    val rows = AuditOps.fkIntegrity(spark, dir).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"${r.getString(0)}: orphans > facts")
      assert(r.getLong(3) <= r.getLong(2), s"${r.getString(0)}: keys > rows")
    }
    // the real star data is clean, so drive the PRODUCTION edge audit
    // with an orphaned fixture: 99 twice + 98 once miss the dim
    import spark.implicits._
    val fact = Seq(1L, 2L, 99L, 99L, 98L).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val r = AuditOps.fkEdge("toy", fact, "fk", dim, "pk").collect()(0)
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L && r.getLong(3) == 2L,
      s"edge audit miscounted: $r")
  }

  test("anomalyZscore matches a driver-side exact computation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val data = (1 to 400).map(i =>
      (i.toLong % 5, math.round(rnd.nextDouble() * 10000) / 100.0)) :+
      (0L, 9999.0) // a planted outlier in group 0
    val df = data.toDF("user_id", "value")
    val got = AuditOps.anomalyZscore(df).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expected = data.groupBy(_._1).map { case (u, vs) =>
      val cents = vs.map(v => math.round(v._2 * 100))
      val n = cents.length.toLong
      val s = cents.sum
      val ssq = cents.map(c => c * c).sum
      val out = cents.count { c =>
        val d = BigInt(n * c - s)
        n >= 2 && BigInt(n) * BigInt(ssq) - BigInt(s) * BigInt(s) > 0 &&
          d * d * BigInt(n - 1) > BigInt(9) * (BigInt(n) * BigInt(ssq) - BigInt(s) * BigInt(s)) * BigInt(n)
      }
      u -> out.toLong
    }
    assert(got == expected)
    assert(got(0L) >= 1L, "the planted outlier was not flagged")
  }

  test("skyline equals the brute-force dominance filter") {
    val parts = Tables.part(spark, dir)
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = parts.filter { case (_, pr, sz) =>
      !parts.exists { case (_, qr, qz) =>
        qr <= pr && qz <= sz && (qr < pr || qz < sz)
      }
    }.map(_._1).toSet
    val got = AuditOps.skyline(Tables.part(spark, dir))
      .collect().map(_.getLong(0)).toSet
    assert(got == brute)
    assert(got.nonEmpty)
  }
}
