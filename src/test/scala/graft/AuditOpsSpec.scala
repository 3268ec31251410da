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

  test("anomalyMad matches a driver-side exact computation and survives what breaks z-score") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // group 0 additionally gets TWO mega-outliers: they inflate stddev so
    // the z-score screen can mask siblings; MAD must still flag both
    val data = (1 to 400).map(i =>
      (i.toLong % 5, math.round(rnd.nextDouble() * 10000) / 100.0)) ++
      Seq((0L, 99999.0), (0L, 88888.0))
    val df = data.toDF("user_id", "value")
    val got = AuditOps.anomalyMad(df).collect()
      .map(r => (r.getLong(0), (r.getAs[Long]("med2"), r.getAs[Long]("mad2"),
        r.getAs[Long]("n_outliers")))).toMap
    val expected = data.groupBy(_._1).map { case (u, vs) =>
      val cents = vs.map(v => math.round(v._2 * 100)).sorted
      val n = cents.length
      val med2 = cents((n + 1) / 2 - 1) + cents((n + 2) / 2 - 1)
      val devs = cents.map(c => math.abs(2 * c - med2)).sorted
      val mad2 = devs((n + 1) / 2 - 1) + devs((n + 2) / 2 - 1)
      val out = cents.count(c => 2 * math.abs(2 * c - med2) > 3 * mad2)
      u -> ((med2, mad2, out.toLong))
    }
    assert(got == expected)
    assert(got(0L)._3 >= 2L, "both planted mega-outliers must be flagged")
  }

  test("anomalyMad doubled median is exact for odd and even group sizes") {
    import spark.implicits._
    // odd group: {1,2,100} -> med2 = 2+2 = 4; even: {1,2,3,100} -> 2+3 = 5
    val df = Seq((1L, 0.01), (1L, 0.02), (1L, 1.00),
      (2L, 0.01), (2L, 0.02), (2L, 0.03), (2L, 1.00)).toDF("user_id", "value")
    val got = AuditOps.anomalyMad(df).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("med2")).toMap
    assert(got == Map(1L -> 4L, 2L -> 5L))
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
