package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin
import graft.plans.{AsofJoinExec, AsofJoinNative}

class AsofNativeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("native asof plans AsofJoinExec with one exchange + one sort per side, no window") {
    val plan = AsofJoin.purchaseAsofClickNative(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"native exec missing:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected one exchange per side, got $exchanges:\n$plan")
    assert(!plan.contains("Window"), s"native plan must not fall back to the window form:\n$plan")
  }

  test("native asof == union+window asof on real data") {
    val native = AsofJoin.purchaseAsofClickNative(spark, dir).collect()
      .map(_.toSeq).toSet
    val window = AsofJoin.purchaseAsofClick(spark, dir).collect()
      .map(_.toSeq).toSet
    assert(native == window)
    assert(native.nonEmpty)
  }

  test("tie semantics: same-time click matches; equal-time clicks resolve to max order; no click -> null") {
    import spark.implicits._
    val probes = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 10L, 20L))
      .toDF("user_id", "t_us", "event_id")
    val clicks = Seq((1L, 100L, 91L), (1L, 100L, 92L), (1L, 40L, 90L))
      .toDF("r_user", "r_t", "click_id")
    val got = AsofJoinNative.asof(probes, clicks,
        "user_id", "r_user", "t_us", "r_t", "click_id")
      .select("user_id", "event_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got((1L, 10L)) == 92L, "equal-time ties must resolve to the max order value")
    assert(got((1L, 11L)) == 90L)
    assert(got((2L, 20L)) == -1L, "no qualifying click must stay null")
  }

  test("null keys/times follow SQL semantics: never match, never stall the merge") {
    import spark.implicits._
    val probes = Seq(
      (Some(-5L), Some(100L), 1L), // negative key: merge must keep advancing
      (Some(1L), Some(100L), 2L),
      (None, Some(100L), 3L),      // null key: matches nothing
      (Some(1L), None, 4L)         // null time: matches nothing
    ).toDF("user_id", "t_us", "event_id")
    val clicks = Seq(
      (Some(-5L), Some(50L), 80L),
      (Option.empty[Long], Some(10L), 81L), // null right key: dropped
      (Some(1L), Option.empty[Long], 82L),  // null right time: dropped
      (Some(1L), Some(90L), 83L)
    ).toDF("r_user", "r_t", "click_id")
    val got = AsofJoinNative.asof(probes, clicks,
        "user_id", "r_user", "t_us", "r_t", "click_id")
      .select("event_id", "click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> 80L, 2L -> 83L, 3L -> -1L, 4L -> -1L), s"got $got")
  }

  test("property: native exec == reference merge on random frames (nulls, ties, empty sides)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // generator: small keyspace + coarse times force heavy key/time ties
    val rowGen = for {
      k <- Gen.frequency(9 -> Gen.choose(-2L, 3L).map(Option(_)), 1 -> Gen.const(Option.empty[Long]))
      t <- Gen.frequency(9 -> Gen.choose(0L, 8L).map(Option(_)), 1 -> Gen.const(Option.empty[Long]))
    } yield (k, t)
    val framesGen = for {
      nl <- Gen.choose(0, 12)
      nr <- Gen.choose(0, 12)
      ls <- Gen.listOfN(nl, rowGen)
      rs <- Gen.listOfN(nr, rowGen)
    } yield (ls, rs)
    // reference: brute-force SQL-null asof semantics
    def reference(ls: Seq[(Option[Long], Option[Long], Long)],
        rs: Seq[(Option[Long], Option[Long], Long)]): Map[Long, Long] =
      ls.map { case (lk, lt, id) =>
        val m = for {
          k <- lk; t <- lt
        } yield rs.filter(r => r._1.contains(k) && r._2.exists(_ <= t))
          .sortBy(r => (r._2.get, r._3)).lastOption.map(_._3).getOrElse(-1L)
        id -> m.getOrElse(-1L)
      }.toMap
    (1 to 60).foreach { i =>
      framesGen(Gen.Parameters.default, Seed(i.toLong)).foreach { case (ls, rs) =>
        val lrows = ls.zipWithIndex.map { case ((k, t), j) => (k, t, j.toLong) }
        val rrows = rs.zipWithIndex.map { case ((k, t), j) => (k, t, 100L + j) }
        val probes = lrows.toDF("user_id", "t_us", "event_id")
        val hist = rrows.toDF("r_user", "r_t", "click_id")
        val got = AsofJoinNative.asof(probes, hist,
            "user_id", "r_user", "t_us", "r_t", "click_id")
          .select("event_id", "click_id").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
        assert(got == reference(lrows, rrows), s"seed $i: left=$lrows right=$rrows")
      }
    }
  }

  test("GraftExtensions injects the asof planner strategy") {
    val strategies = org.apache.spark.sql.graftbridge.SqlBridge
      .plannerStrategiesOf(spark, new graft.functions.GraftExtensions()(_))
    assert(strategies.contains(graft.plans.AsofStrategy),
      s"extensions must register AsofStrategy, got: $strategies")
  }

  test("results are partitioning-independent (odd shuffle partitions)") {
    val base = AsofJoin.purchaseAsofClickNative(spark, dir).collect().map(_.toSeq).toSet
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      val odd = AsofJoin.purchaseAsofClickNative(spark, dir).collect().map(_.toSeq).toSet
      assert(odd == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
