package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamAsof
import graft.streaming.StreamAsof.{AsofEvent, LatestRight}

/** Streaming as-of join: the per-key state step is a pure function — test
  * its semantics directly (inclusive match, tie resolution, state
  * carry-over), then one cross-batch scenario through a real
  * GroupState-less replay.
  */
class StreamAsofSpec extends AnyFunSuite {

  /** Replay batches through `step` with a hand-held state cell (the
    * GroupState contract reduced to get/update for NoTimeout batches).
    */
  private def replay(batches: Seq[Seq[AsofEvent]]): Seq[StreamAsof.AsofOut] = {
    final class Cell extends org.apache.spark.sql.streaming.GroupState[LatestRight] {
      private var v: Option[LatestRight] = None
      def exists: Boolean = v.isDefined
      def get: LatestRight = v.get
      def getOption: Option[LatestRight] = v
      def update(s: LatestRight): Unit = { v = Some(s) }
      def remove(): Unit = { v = None }
      def hasTimedOut: Boolean = false
      def setTimeoutDuration(d: Long): Unit = ()
      def setTimeoutDuration(d: String): Unit = ()
      def setTimeoutTimestamp(t: Long): Unit = ()
      def setTimeoutTimestamp(t: Long, add: String): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
      def getCurrentWatermarkMs(): Long = 0L
      def getCurrentProcessingTimeMs(): Long = 0L
    }
    val cell = new Cell
    batches.flatMap(b => StreamAsof.step(7L, b.iterator, cell).toSeq)
  }

  private def click(ms: Long, id: Long, v: Double) = AsofEvent(7L, ms, 0, id, v)
  private def buy(ms: Long, id: Long, v: Double) = AsofEvent(7L, ms, 1, id, v)

  test("probe with no prior right row emits nulls; later probes see the latest click") {
    val out = replay(Seq(Seq(buy(10, 100, 1.0), click(20, 200, 2.0), buy(30, 101, 3.0))))
    assert(out.map(o => (o.t_ms, o.click_event_id)) ==
      Seq((10L, null), (30L, java.lang.Long.valueOf(200L))))
  }

  test("equal-time click matches inclusively and ties resolve to the greatest event_id") {
    val out = replay(Seq(Seq(
      click(10, 200, 2.0), click(10, 205, 5.0), buy(10, 100, 1.0))))
    assert(out.size == 1)
    assert(out.head.click_event_id == 205L && out.head.click_value == 5.0)
  }

  test("batch-internal ordering is by time, not arrival: late-listed click still matches") {
    val out = replay(Seq(Seq(buy(30, 100, 1.0), click(10, 200, 2.0))))
    assert(out.head.click_event_id == 200L)
  }

  test("state carries the latest right row across batches") {
    val out = replay(Seq(
      Seq(click(10, 200, 2.0)),
      Seq(buy(20, 100, 1.0)),
      Seq(click(30, 201, 3.0), buy(40, 101, 4.0))))
    assert(out.map(o => (o.event_id, o.click_event_id)) ==
      Seq((100L, java.lang.Long.valueOf(200L)), (101L, java.lang.Long.valueOf(201L))))
  }

  test("an older click never overwrites newer state") {
    val out = replay(Seq(
      Seq(click(50, 200, 2.0)),
      // ms 10 < 50: must NOT replace the state even though it arrives later
      Seq(click(10, 999, 9.0), buy(60, 100, 1.0))))
    assert(out.head.click_event_id == 200L)
  }
}
