package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Incoming transaction event for stateful processing. */
case class TxnEvent(customer_id: Long, amount: Double, risk_score: Double)

/** Checkpointed per-customer state. */
case class CustState(n_txns: Long, total_amount: Double, n_high_risk: Long)

/** Per-batch emitted state snapshot. */
case class CustUpdate(
    customer_id: Long,
    n_txns: Long,
    total_amount: Double,
    n_high_risk: Long,
    flagged: Boolean)

/** Custom streaming state beyond what dropDuplicates expresses (ST3+):
  *
  *   - per-customer running aggregates + fraud flag via
  *     `flatMapGroupsWithState` — arbitrary keyed state in the
  *     checkpointed state store, the Structured Streaming analogue of a
  *     Beam stateful DoFn. State is hash-partitioned by key: horizontal
  *     at any customer cardinality, and it survives restarts (proved in
  *     StreamStateSpec). The fold is order-independent (counts/sums), so
  *     results are deterministic under shuffle.
  *   - event-time windowed volume rollup with a watermark (ST2/A7): the
  *     dashboard's revenue-by-window series computed IN the stream;
  *     append mode emits each window exactly once, when the watermark
  *     passes its end, and late events beyond the watermark are dropped
  *     instead of corrupting emitted windows.
  */
object StreamState {

  val HighRisk = 0.60 // generate_fact_transactions_data.py:196-199 split
  val FlagAfter = 3L

  val txnSchema: StructType = StructType(Seq(
    StructField("customer_id", LongType),
    StructField("amount", DoubleType),
    StructField("risk_score", DoubleType)))

  /** One state snapshot per customer per micro-batch that saw activity. */
  def customerState(events: Dataset[TxnEvent]): Dataset[CustUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.customer_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, batch: Iterator[TxnEvent], state: GroupState[CustState]) =>
          var s = state.getOption.getOrElse(CustState(0L, 0.0, 0L))
          batch.foreach { e =>
            s = CustState(
              s.n_txns + 1,
              s.total_amount + e.amount,
              s.n_high_risk + (if (e.risk_score >= HighRisk) 1L else 0L))
          }
          state.update(s)
          Iterator(CustUpdate(id, s.n_txns, s.total_amount, s.n_high_risk,
            s.n_high_risk >= FlagAfter))
      }
  }

  /** Start the stateful customer stream over a JSON landing dir. */
  def startCustomerState(
      spark: SparkSession,
      landingDir: String,
      outDir: String,
      checkpointDir: String,
      availableNow: Boolean = false): StreamingQuery = {
    import spark.implicits._
    val events = spark.readStream.schema(txnSchema).json(landingDir).as[TxnEvent]
    val w = customerState(events).toDF()
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Streaming sessionization via the native `session_window`: per-user
    * sessions close after 30 minutes of inactivity; append mode emits a
    * session exactly once, when the watermark passes its close. The
    * batch q_sessionize (lag + running sum) computes the same grouping
    * offline; this is its streaming twin with bounded state (sessions
    * older than the watermark are evicted).
    */
  def startSessionized(
      spark: SparkSession,
      landingDir: String,
      outDir: String,
      checkpointDir: String,
      availableNow: Boolean = false): StreamingQuery = {
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("user_id", LongType)))
    val agg = spark.readStream.schema(schema).json(landingDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_events"))
    val w = agg.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** ST2: event-time 5-minute volume windows with a 10-minute watermark.
    * Append mode — a window is emitted exactly once, after the watermark
    * passes its end; events later than the watermark are dropped.
    */
  def startWindowedVolume(
      spark: SparkSession,
      landingDir: String,
      outDir: String,
      checkpointDir: String,
      availableNow: Boolean = false): StreamingQuery = {
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("amount", DoubleType)))
    val agg = spark.readStream.schema(schema).json(landingDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("n_txns"), sum(col("amount")).as("volume"))
      .select(col("w.start").as("window_start"), col("n_txns"), col("volume"))
    val w = agg.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }
}
