package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, FinanceOps, SampleOps}

class FinanceOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ev(rows: Seq[(Long, Long, Long, String, Double)]) = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("us", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3, r._4, r._5))),
        schema)
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .withColumn("props", lit("{}"))
  }

  test("integer EWMA fold: known sequence, flags only on real jumps") {
    // user 1: 100.00, 100.00, 400.00 (jump > $200 off level 10000), 400.00
    // levels: 10000 -> (10000+10000)/2=10000 -> (10000+40000)/2=25000 -> 32500
    val rows = FinanceOps.ewmaFlags(ev(Seq(
      (1L, 10L, 1L, "purchase", 100.00),
      (2L, 20L, 1L, "purchase", 100.00),
      (3L, 30L, 1L, "purchase", 400.00),
      (4L, 40L, 1L, "purchase", 400.00),
      (10L, 50L, 2L, "purchase", 50.00)))).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(1L) == ((4L, 32500L, 1L)))
    assert(rows(2L) == ((1L, 5000L, 0L))) // single event: level = itself, no flag
  }

  test("ohlc open/close break timestamp ties by event_id") {
    val day = 86400000000L
    // Two trades at the identical microsecond on both ends of the day:
    // open must be the lower event_id's price, close the higher's.
    val bars = FinanceOps.ohlcBars(ev(Seq(
      (2L, day + 10L, 1L, "purchase", 5.00), // tied open, higher id
      (1L, day + 10L, 1L, "purchase", 3.00), // tied open, lower id -> open
      (3L, day + 99L, 1L, "purchase", 1.00),
      (5L, day + 500L, 1L, "purchase", 7.00), // tied close, higher id -> close
      (4L, day + 500L, 1L, "purchase", 2.00)))).collect()
    assert(bars.length == 1)
    val b = bars.head
    assert(b.getAs[Long]("open_cents") == 300L)
    assert(b.getAs[Long]("close_cents") == 700L)
    assert(b.getAs[Long]("high_cents") == 700L)
    assert(b.getAs[Long]("low_cents") == 100L)
    assert(b.getAs[Long]("volume_cents") == 1800L)
    assert(b.getAs[Long]("n_trades") == 5L)
  }

  test("running balance: purchases debit, running min and overdrafts counted") {
    val out = FinanceOps.runningBalance(ev(Seq(
      (1L, 100L, 7L, "signup", 1.00),    // +100 -> 100
      (2L, 200L, 7L, "purchase", 3.00),  // -300 -> -200 (overdraft)
      (3L, 300L, 7L, "click", 0.50),     // +50  -> -150 (overdraft)
      (4L, 400L, 7L, "view", 5.00)))).collect() // +500 -> 350
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("final_cents") == 350L)
    assert(r.getAs[Long]("min_cents") == -200L)
    assert(r.getAs[Long]("n_overdraft") == 2L) // rows at -200, -150
  }

  test("running balance and group order stats match a brute-force reference on random data") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 400L).map { id =>
      (id, rnd.nextInt(100000).toLong, rnd.nextLong(7L),
        Seq("view", "click", "purchase")(rnd.nextInt(3)),
        math.round(rnd.nextDouble() * 20000) / 100.0)
    }
    val df = ev(rows)

    // brute balance per user, in (t, event_id) order
    val byUser = rows.groupBy(_._3).map { case (u, es) =>
      val deltas = es.sortBy(e => (e._2, e._1))
        .map(e => (if (e._4 == "purchase") -1 else 1) * math.round(e._5 * 100))
      val running = deltas.scanLeft(0L)(_ + _).drop(1)
      u -> ((deltas.sum, running.min, running.count(_ < 0).toLong))
    }
    val got = graft.operators.FinanceOps.runningBalance(df).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("final_cents"), r.getAs[Long]("min_cents"),
          r.getAs[Long]("n_overdraft")))).toMap
    assert(got == byUser)

    // brute per-type order statistics at the integer selection ranks
    val byType = rows.groupBy(_._4).map { case (t, es) =>
      val sorted = es.map(e => math.round(e._5 * 100)).sorted
      val n = sorted.length
      def sel(rank: Long) = sorted((rank - 1).toInt)
      t -> ((n.toLong, sel((n + 1) / 2), sel((95L * n + 99) / 100), sel((99L * n + 99) / 100)))
    }
    val gotSlo = SampleOps.groupOrderStats(df).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("p50_cents"),
          r.getAs[Long]("p95_cents"), r.getAs[Long]("p99_cents")))).toMap
    assert(gotSlo == byType)
  }

  test("drawdown: peak-to-trough gap found even through a later lower peak") {
    // user 1: +100.00 -> bal 10000 (peak), purchase 60.00 -> 4000 (dd 6000),
    // +20.00 -> 6000 (dd 4000), purchase 70.00 -> -1000 (dd 11000)
    val out = FinanceOps.drawdown(ev(Seq(
      (1L, 10L, 1L, "view", 100.00),
      (2L, 20L, 1L, "purchase", 60.00),
      (3L, 30L, 1L, "view", 20.00),
      (4L, 40L, 1L, "purchase", 70.00)))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_events") == 4L)
    assert(r.getAs[Long]("peak_cents") == 10000L)
    assert(r.getAs[Long]("max_drawdown_cents") == 11000L)
    assert(r.getAs[Long]("final_cents") == -1000L)
  }

  test("cusum: alarm fires at the H crossing and the statistic re-arms") {
    // K=10000, H=40000. user 1: 250.00 x3 -> s 15000, 30000, 45000 >= H
    // (alarm, reset), then 50.00 -> max(0, 5000-10000) = 0.
    val m = FinanceOps.cusumFlags(ev(Seq(
      (1L, 10L, 1L, "purchase", 250.00),
      (2L, 20L, 1L, "purchase", 250.00),
      (3L, 30L, 1L, "purchase", 250.00),
      (4L, 40L, 1L, "purchase", 50.00),
      (9L, 50L, 2L, "purchase", 30.00)))).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m(1L) == ((4L, 0L, 1L)))
    assert(m(2L) == ((1L, 0L, 0L))) // 3000 - 10000 clamps to 0, no alarm
  }

  test("vwap is the exact quantity-weighted integer mean per brand-month") {
    import org.apache.spark.sql.functions.{col, lit, to_timestamp}
    val li = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 10.00, 2.0, "2024-03-05"),
        Row(1L, 20.00, 1.0, "2024-03-20"),
        Row(2L, 99.99, 5.0, "2024-04-01"))),
      StructType(Seq(StructField("l_partkey", LongType),
        StructField("l_extendedprice", DoubleType),
        StructField("l_quantity", DoubleType),
        StructField("d", StringType))))
      .withColumn("l_shipdate", to_timestamp(col("d"))).drop("d")
    val part = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "B#1"), Row(2L, "B#2"))),
      StructType(Seq(StructField("p_partkey", LongType),
        StructField("p_brand", StringType))))
    val m = FinanceOps.vwap(li, part).collect()
      .map(r => (r.getAs[String]("brand"), r.getAs[Long]("ym")) ->
        ((r.getAs[Long]("notional_cents"), r.getAs[Long]("volume"),
          r.getAs[Long]("vwap_cents"))))
      .toMap
    assert(m(("B#1", 202403L)) == ((4000L, 3L, 1333L))) // (1000*2 + 2000*1) DIV 3
    assert(m(("B#2", 202404L)) == ((49995L, 5L, 9999L)))
  }

  test("dup spans count OCCURRENCES: a doc repeating a shared phrase counts it twice") {
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "a b c x a b c"), // trigrams: "a b c","b c x","c x a","x a b","a b c"
        Row(2L, "a b c"),         // shares "a b c"
        Row(3L, "q r s t"))),     // no overlap
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val m = DedupOps.dupSpanStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_dup_shingles"), r.getAs[Long]("dup_ppm")))
      .toMap
    assert(m(1L) == ((5L, 2L, 400000L))) // BOTH "a b c" occurrences are dup
    assert(m(2L) == ((1L, 1L, 1000000L)))
    assert(m(3L) == ((2L, 0L, 0L)))
  }
}
