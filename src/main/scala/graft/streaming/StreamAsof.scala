package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.Tables

/** Streaming as-of join — the running-state twin of
  * [[graft.operators.AsofJoin]] (named there as the streaming
  * counterpart; VERDICT r4 ask #4).
  *
  * The batch operator answers "latest right row at-or-before each left
  * row" with a union + per-key window. A stream cannot window over
  * unbounded history, but it doesn't need to: the only right-side fact a
  * probe row can ever match is the LATEST right row so far, so the
  * operator keeps exactly one right row per key in the state store
  * (`flatMapGroupsWithState`) and each left row emits on arrival, joined
  * against that state. Constant state per key — this is what lets the
  * operator run forever: history length never accumulates, unlike the
  * stream-stream join whose state holds a watermark-bounded interval.
  *
  * Within a micro-batch the group's rows arrive unordered, so each batch
  * sorts its group slice by (time, side, order) — right-before-left at
  * equal times (inclusive match) and greatest `order` last among tied
  * right rows (last write wins) — the exact ordering the batch plan's
  * window uses. Across batches the landing fixture is ONE file in that
  * ascending order, so arrival order tracks event time and the running
  * state is always complete for every probe (same single-sorted-file
  * construction as q_stream_window / q_stream_join).
  */
object StreamAsof {

  /** One event row off the wire; `side` 0 = right (click), 1 = left. */
  final case class AsofEvent(user_id: Long, ms: Long, side: Int,
    event_id: Long, value: Double)

  /** Latest right row per key — the ENTIRE state, constant-size. */
  final case class LatestRight(ms: Long, event_id: Long, value: Double)

  final case class AsofOut(user_id: Long, t_ms: Long, event_id: Long,
    value: Double, click_event_id: java.lang.Long, click_value: java.lang.Double)

  /** Per-key batch step: replay this batch's slice in (ms, side, order)
    * order over the carried latest-right state; left rows emit, right
    * rows update. `>=` on (ms, event_id) makes the last tied right row
    * win, matching the batch oracle's dedup-to-max rule.
    */
  def step(userId: Long, rows: Iterator[AsofEvent],
      state: GroupState[LatestRight]): Iterator[AsofOut] = {
    var latest: Option[LatestRight] = state.getOption
    val out = Vector.newBuilder[AsofOut]
    rows.toSeq.sortBy(e => (e.ms, e.side, e.event_id)).foreach { e =>
      if (e.side == 0) {
        if (latest.forall(s => e.ms > s.ms || (e.ms == s.ms && e.event_id >= s.event_id)))
          latest = Some(LatestRight(e.ms, e.event_id, e.value))
      } else {
        out += AsofOut(userId, e.ms, e.event_id, e.value,
          latest.map(s => java.lang.Long.valueOf(s.event_id)).orNull,
          latest.map(s => java.lang.Double.valueOf(s.value)).orNull)
      }
    }
    latest.foreach(state.update)
    out.result().iterator
  }

  private val wireSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("ms", LongType),
    StructField("side", IntegerType),
    StructField("event_id", LongType),
    StructField("value", DoubleType)))

  /** Landing fixture: purchases (side 1) and clicks (side 0) in ONE file,
    * ascending (ms, side, event_id) — clicks sort before purchases at
    * equal times, so the inclusive match holds under any batch split.
    */
  private def fixtureDf(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        when(col("event_type") === "click", lit(0)).otherwise(lit(1)).as("side"),
        col("event_id"), col("value"))
      .repartition(1)
      .sortWithinPartitions(col("ms"), col("side"), col("event_id"))

  /** Pre-write the landing fixture untimed (Bench.warmFixtures hook). */
  def warmFixture(s: SparkSession, dir: String): Unit = {
    StreamQueries.ensureJsonishFixture(
      StreamQueries.fixtureDir("asof", dir, "events"), fixtureDf(s, dir))
    ()
  }

  def streamAsof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val landing = StreamQueries.ensureJsonishFixture(
      StreamQueries.fixtureDir("asof", dir, "events"),
      fixtureDf(s, dir))
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_")
      .toFile.getAbsolutePath
    // stateful query: state-store instances = shuffle partitions, sized
    // like the other stateful stream queries (see StreamQueries)
    StreamQueries.withShufflePartitions(s, StreamQueries.StatefulShufflePartitions) {
      val q = s.readStream.schema(wireSchema).json(landing)
        .as[AsofEvent]
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.NoTimeout())(step)
        .writeStream
        .format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.read.parquet(s"$tmp/out")
      .select("user_id", "t_ms", "event_id", "value",
        "click_event_id", "click_value")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_asof" -> ((s, dir) => streamAsof(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    // The batch as-of (q_asof_join's DuckDB ASOF LEFT JOIN) over integer
    // ms, with tied right timestamps deduplicated to the max-event_id row
    // — exactly the last-write-wins rule of the running state.
    "q_stream_asof" ->
      """WITH l AS (SELECT user_id, epoch_ms(ts) AS t_ms, event_id, value
        |  FROM events WHERE event_type = 'purchase'),
        | r0 AS (SELECT user_id, epoch_ms(ts) AS ms,
        |   event_id AS click_event_id, value AS click_value
        |  FROM events WHERE event_type = 'click'),
        | r AS (SELECT user_id, ms, click_event_id, click_value FROM (
        |   SELECT *, row_number() OVER (PARTITION BY user_id, ms
        |     ORDER BY click_event_id DESC) AS rn FROM r0) z WHERE rn = 1)
        |SELECT l.user_id, l.t_ms, l.event_id, l.value,
        | r.click_event_id, r.click_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.t_ms >= r.ms""".stripMargin
  )
}
