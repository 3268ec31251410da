package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamQueries

/** The stream-stream LEFT OUTER join must equal the relational left join:
  * every purchase row appears exactly once per matching click, and every
  * unmatched purchase appears exactly once with NULL click — including the
  * LAST in-window purchase, whose emission depends on the sentinel batch
  * advancing the global watermark (the part a truncated-tail bug would drop).
  */
class StreamLeftJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming left join == batch left join, unmatched tail included") {
    val got = StreamQueries.streamLeftJoin(spark, dir)
      .select("user_id", "p_ms", "purchase_event_id", "c_ms", "click_event_id")

    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id"), col("event_type"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms").as("p_ms"),
        col("event_id").as("purchase_event_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ms").as("c_ms"),
        col("event_id").as("click_event_id"))
    val want = p.join(c,
        col("user_id") === col("c_user_id") &&
          col("c_ms") <= col("p_ms") &&
          col("c_ms") >= col("p_ms") - lit(300000L),
        "left_outer")
      .select("user_id", "p_ms", "purchase_event_id", "c_ms", "click_event_id")

    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // The outer rows (NULL click) exist, and the latest unmatched purchase
    // is among them — the row only the sentinel-flushed trailing batch emits.
    val gotOuter = got.filter(col("click_event_id").isNull)
    val wantOuter = want.filter(col("click_event_id").isNull)
    assert(gotOuter.count() == wantOuter.count() && wantOuter.count() > 0)
    val lastUnmatched = wantOuter.agg(max("p_ms")).head.getLong(0)
    assert(gotOuter.filter(col("p_ms") === lastUnmatched).count() > 0)
  }
}
