package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{MiningOps, SequenceOps}

class MiningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"
  private lazy val events = Tables.events(spark, dir)

  test("RFM codes partition all customers and stay within quartile digit bounds") {
    val rows = MiningOps.rfmSegments(Tables.orders(spark, dir)).collect()
    val total = rows.map(_.getLong(1)).sum
    val nCust = Tables.orders(spark, dir).select("o_custkey").distinct().count()
    assert(total == nCust)
    rows.foreach { r =>
      val code = r.getInt(0)
      val (rq, fq, mq) = (code / 100, code / 10 % 10, code % 10)
      assert(rq >= 1 && rq <= 4 && fq >= 1 && fq <= 4 && mq >= 1 && mq <= 4, s"code $code")
    }
  }

  test("cut-point RFM partitions all customers with no unpartitioned window in the plan") {
    val df = MiningOps.rfmSegmentsCuts(Tables.orders(spark, dir))
    // the whole point of the variant: every Window node must carry a
    // non-empty partitionSpec (the global-ntile plan it replaces moves
    // the entire customer frame to ONE task)
    val globalWindows = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, "found an unpartitioned window")
    val rows = df.collect()
    val total = rows.map(_.getLong(1)).sum
    val nCust = Tables.orders(spark, dir).select("o_custkey").distinct().count()
    assert(total == nCust, "codes must partition the customer set")
    rows.foreach { r =>
      val code = r.getLong(0)
      val (rq, fq, mq) = (code / 100, code / 10 % 10, code % 10)
      assert(rq >= 1 && rq <= 4 && fq >= 1 && fq <= 4 && mq >= 1 && mq <= 4, s"code $code")
    }
  }

  test("co-purchase pairs are normalized, distinct brands, and bounded by order count") {
    val rows = MiningOps.coPurchase(spark, dir).collect()
    assert(rows.nonEmpty)
    val nOrders = Tables.orders(spark, dir).count()
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair not normalized")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= nOrders)
    }
  }

  test("attribution credits only clicks at or before the purchase") {
    val attr = SequenceOps.attribution(events)
    val times = events.select(col("event_id"), unix_micros(col("ts")).as("t"))
    val bad = attr.filter(col("click_id").isNotNull)
      .join(times.withColumnRenamed("event_id", "purchase_id")
        .withColumnRenamed("t", "pt"), "purchase_id")
      .join(times.withColumnRenamed("event_id", "click_id")
        .withColumnRenamed("t", "ct"), "click_id")
      .filter(col("ct") > col("pt"))
    assert(bad.count() == 0, "a purchase was attributed to a later click")
    assert(attr.count() == events.filter(col("event_type") === "purchase").count())
  }

  test("doubled median lies between doubled min and max and converters match funnel stage 3") {
    val r = SequenceOps.conversionLag(events).collect()(0)
    val (n, maxLag, p50x2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n > 0 && p50x2 <= 2 * maxLag && p50x2 >= 0)
    val funnelPurchase = SequenceOps.funnel(events)
      .filter(col("stage") === "3_purchase").collect()(0).getLong(1)
    assert(n == funnelPurchase)
  }
}
