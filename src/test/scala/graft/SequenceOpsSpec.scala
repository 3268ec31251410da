package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SequenceOps

class SequenceOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val events = Tables.events(spark, dir)

  test("Theil-Sen slope ignores a wild outlier week (robustness property)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    // weekly counts 1,2,3,4 then an outlier week of 100: all six
    // clean-pair slopes are exactly 1/week; the four outlier pairs are
    // huge; the doubled median must still read 2 * 1e6 micro/week
    val wkUs = 604800000000L
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    var id = 0L
    for ((wk, n) <- Seq((0, 1), (1, 2), (2, 3), (3, 4), (4, 100)); _ <- 1 to n) {
      id += 1
      rows += Row(id, wk * wkUs + id, 1L, "trend", 1.0)
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("us", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = SequenceOps.theilSenTrend(df).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 10L)       // C(5,2) pairs
    assert(out(0).getLong(2) == 2000000L)  // doubled median = 2 x 1e6
    spark.catalog.clearCache()
  }

  test("bucketed sweep-line peak concurrency equals a naive driver sweep") {
    val row = SequenceOps.maxOverlap(events).collect().head
    val (nSess, peak, peakAt) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // naive recomputation: driver-side sessionize + sweep
    val evs = events.selectExpr("user_id", "event_id", "unix_millis(ts) AS tms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = evs.groupBy(_._1).values.flatMap { us =>
      val sorted = us.sortBy(e => (e._3, e._2))
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for ((_, _, t) <- sorted) {
        if (bounds.nonEmpty && t - bounds.last._2 <= 1800000L)
          bounds(bounds.length - 1) = (bounds.last._1, t)
        else bounds += ((t, t))
      }
      bounds
    }.toSeq
    assert(nSess == sessions.length)
    val net = sessions.flatMap { case (s, e) => Seq(s -> 1L, (e + 1) -> -1L) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var run = 0L; var best = Long.MinValue; var bestAt = 0L
    for ((t, d) <- net) { run += d; if (run > best) { best = run; bestAt = t } }
    assert(peak == best && peakAt == bestAt, s"got ($peak,$peakAt) want ($best,$bestAt)")
    spark.catalog.clearCache()
  }

  test("funnel stage counts are monotonically non-increasing") {
    val rows = SequenceOps.funnel(events).orderBy("stage").collect()
    assert(rows.length == 3)
    val counts = rows.map(_.getLong(1))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2),
      s"funnel not monotone: ${counts.mkString(",")}")
    assert(counts(0) > 0)
  }

  test("funnel stage ordering is temporal, not just presence") {
    import spark.implicits._
    // user 1 purchases BEFORE clicking: reaches click but not purchase
    val fixture = Seq(
      (1L, 1L, "view", 1000L, 0.0),
      (2L, 1L, "purchase", 2000L, 0.0),
      (3L, 1L, "click", 3000L, 0.0),
      (4L, 2L, "view", 1000L, 0.0),
      (5L, 2L, "click", 2000L, 0.0),
      (6L, 2L, "purchase", 3000L, 0.0)
    ).toDF("event_id", "user_id", "event_type", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = SequenceOps.funnel(fixture).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("1_view" -> 2L, "2_click" -> 2L, "3_purchase" -> 1L))
  }

  test("cohort retention: week offsets are non-negative and week-0 is the max cell per cohort") {
    val ret = SequenceOps.cohortRetention(events).cache()
    try {
      assert(ret.filter(col("week_offset") < 0).count() == 0)
      // every user active at offset k>0 was active at offset 0 (their signup)
      val bad = ret.alias("a").join(
          ret.filter(col("week_offset") === 0)
            .select(col("cohort_week"), col("users").as("u0")), "cohort_week")
        .filter(col("users") > col("u0"))
      assert(bad.count() == 0, "a later-week cell exceeded the cohort's week-0 size")
    } finally ret.unpersist()
  }

  test("transition probabilities sum to 1 per source state") {
    val sums = SequenceOps.transitions(events)
      .groupBy("prev").agg(sum("p").as("s")).collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-4,
      s"${r.getString(0)} sums to ${r.getDouble(1)}"))
  }

  test("WAU dominates DAU and is bounded by the user population") {
    val rows = SequenceOps.dauWau(events).collect()
    assert(rows.nonEmpty)
    val nUsers = events.select("user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"day ${r.getLong(0)}: wau < dau")
      assert(r.getLong(2) <= nUsers)
    }
  }

  test("velocity flags trigger on exactly N-in-span, boundary inclusive") {
    import spark.implicits._
    val h = SequenceOps.VelocitySpanUs
    val fixture = Seq(
      // u1: three events spanning EXACTLY the window -> trigger
      (1L, 1L, "view", 0L), (2L, 1L, "click", h / 2), (3L, 1L, "view", h),
      // u2: three events, one micro too wide -> no trigger
      (4L, 2L, "view", 0L), (5L, 2L, "click", h / 2), (6L, 2L, "view", h + 1),
      // u3: only two events -> never enough
      (7L, 3L, "view", 0L), (8L, 3L, "click", 1L)
    ).map { case (id, u, tp, us) => (id, u, tp, us, 0.0) }
      .toDF("event_id", "user_id", "event_type", "us", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val got = SequenceOps.velocityFlags(fixture).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ((1L, h))), s"got $got")
  }

  test("position attribution: credits sum to exactly 1e6 per purchase, U-shape holds") {
    import spark.implicits._
    // u1: 4 clicks then a purchase (journey of 4), then 1 click + purchase
    val fixture = Seq(
      (1L, 1L, "click", 10L), (2L, 1L, "click", 20L), (3L, 1L, "click", 30L),
      (4L, 1L, "click", 40L), (5L, 1L, "purchase", 50L),
      (6L, 1L, "click", 60L), (7L, 1L, "purchase", 70L),
      // u2: purchase with no clicks -> no attribution rows
      (8L, 2L, "purchase", 10L)
    ).map { case (id, u, tp, us) => (id, u, tp, us, 0.0) }
      .toDF("event_id", "user_id", "event_type", "us", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val rows = SequenceOps.attributionPosition(fixture).collect()
    // every purchase's credits sum to exactly 1e6
    val perPurchase = rows.groupBy(_.getAs[Long]("purchase_id"))
      .view.mapValues(_.map(_.getAs[Long]("credit_ppm")).sum).toMap
    assert(perPurchase == Map(5L -> 1000000L, 7L -> 1000000L), s"got $perPurchase")
    // U-shape on the 4-click journey: 400000+residue / 100000 / 100000 / 400000
    val j1 = rows.filter(_.getAs[Long]("purchase_id") == 5L)
      .map(r => r.getAs[Long]("pos") -> r.getAs[Long]("credit_ppm")).toMap
    assert(j1 == Map(1L -> 400000L, 2L -> 100000L, 3L -> 100000L, 4L -> 400000L))
    // single-click journey takes full credit
    val j2 = rows.filter(_.getAs[Long]("purchase_id") == 7L)
    assert(j2.map(_.getAs[Long]("credit_ppm")).toSeq == Seq(1000000L))
    assert(!rows.exists(_.getAs[Long]("user_id") == 2L))
  }

  test("twap lies within the user's [min, max] value range") {
    val bounds = events.groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val bad = SequenceOps.twap(events).join(bounds, "user_id")
      // twap excludes the last event's value; widen by a cent for rounding
      .filter(col("twap") < col("lo") - 0.01 || col("twap") > col("hi") + 0.01)
    assert(bad.count() == 0)
  }
}
