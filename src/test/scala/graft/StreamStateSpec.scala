package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamState

/** Custom streaming state (flatMapGroupsWithState) and watermark
  * semantics: keyed state survives restart; windows emit exactly once in
  * append mode; late events beyond the watermark are dropped.
  */
class StreamStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def writeFile(dir: String, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes("UTF-8"))
    ()
  }

  private def txn(cust: Long, amount: Double, risk: Double): String =
    s"""{"customer_id":$cust,"amount":$amount,"risk_score":$risk}"""

  test("per-customer state accumulates across restart; flag fires at 3 high-risk") {
    val tmp = Files.createTempDirectory("graft_state_").toFile.getAbsolutePath
    writeFile(s"$tmp/landing", "b1.json", Seq(
      txn(1, 100.0, 0.9), txn(1, 50.0, 0.7), txn(2, 10.0, 0.1)))
    val q1 = StreamState.startCustomerState(spark, s"$tmp/landing",
      s"$tmp/out", s"$tmp/ckpt", availableNow = true)
    q1.awaitTermination()

    val snap1 = spark.read.parquet(s"$tmp/out").collect()
      .map(r => r.getAs[Long]("customer_id") -> r).toMap
    assert(snap1(1L).getAs[Long]("n_txns") == 2)
    assert(snap1(1L).getAs[Long]("n_high_risk") == 2)
    assert(!snap1(1L).getAs[Boolean]("flagged"))
    assert(snap1(2L).getAs[Long]("n_txns") == 1)

    // restart: customer 1's third high-risk txn must see the prior state
    writeFile(s"$tmp/landing", "b2.json", Seq(txn(1, 25.0, 0.8)))
    val q2 = StreamState.startCustomerState(spark, s"$tmp/landing",
      s"$tmp/out", s"$tmp/ckpt", availableNow = true)
    q2.awaitTermination()

    val rows2 = spark.read.parquet(s"$tmp/out").collect()
      .filter(_.getAs[Long]("customer_id") == 1L)
      .sortBy(_.getAs[Long]("n_txns"))
    assert(rows2.length == 2) // one snapshot per batch with activity
    val last = rows2.last
    assert(last.getAs[Long]("n_txns") == 3)
    assert(last.getAs[Double]("total_amount") == 175.0)
    assert(last.getAs[Long]("n_high_risk") == 3)
    assert(last.getAs[Boolean]("flagged"))
  }

  test("MG sketch state merges across micro-batches (one file per trigger)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val in = Files.createTempDirectory("graft_mgstream_").toFile.getAbsolutePath
    val out = Files.createTempDirectory("graft_mgstream_out_").toFile.getAbsolutePath
    // 3 files -> 3 micro-batches; key 1 is heavy ONLY across all batches
    // (10 of 30 rows overall, but at most 4 of 10 within any one file),
    // so catching it proves cross-batch buffer merging, not per-batch luck
    (0 until 3).foreach { f =>
      val lines = (0 until 10).map { i =>
        val k = if (i < (if (f == 1) 4 else 3)) 1L else 100L + f * 10 + i
        s"""{"k":$k}"""
      }
      writeFile(in, s"f$f.json", lines)
    }
    val schema = StructType(Seq(StructField("k", LongType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
      .agg(graft.functions.MisraGriesAggregate.mgSketch(col("k"), 4).as("mg"),
        count(lit(1)).as("n"))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("overwrite").parquet(s"$out/sink")
      }
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val row = spark.read.parquet(s"$out/sink").collect()(0)
    assert(row.getLong(row.fieldIndex("n")) == 30L)
    val mg = row.getMap[Long, Long](row.fieldIndex("mg"))
    // key 1 freq 10 > 30/(4+1): the MG guarantee must catch it, and the
    // estimate may undercount by at most 6
    assert(mg.contains(1L), s"heavy key lost across micro-batches: $mg")
    assert(mg(1L) >= 10L - 6L && mg(1L) <= 10L)
  }

  test("streaming session_window: 30-min gap splits sessions, emitted once closed") {
    val tmp = Files.createTempDirectory("graft_sess_").toFile.getAbsolutePath
    def ev(ts: String, user: Long) = s"""{"ts":"2024-03-15T$ts","user_id":$user}"""
    def run(): Unit = {
      val q = StreamState.startSessionized(spark, s"$tmp/landing",
        s"$tmp/out", s"$tmp/ckpt", availableNow = true)
      q.awaitTermination()
    }
    // session A: 10:00 + 10:10 (same session); 12:00 starts session B and
    // advances the watermark past A's close
    writeFile(s"$tmp/landing", "b1.json", Seq(
      ev("10:00:00", 1), ev("10:10:00", 1), ev("12:00:00", 1)))
    run()
    writeFile(s"$tmp/landing", "b2.json", Seq(ev("13:30:00", 1))) // closes B
    run()
    writeFile(s"$tmp/landing", "b3.json", Seq(ev("15:00:00", 1))) // flushes B
    run()

    val sessions = spark.read.parquet(s"$tmp/out").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("session_start").toString,
        r.getAs[java.sql.Timestamp]("session_end").toString,
        r.getAs[Long]("n_events"))).sorted
    assert(sessions.contains(("2024-03-15 10:00:00.0", "2024-03-15 10:40:00.0", 2L)))
    assert(sessions.contains(("2024-03-15 12:00:00.0", "2024-03-15 12:30:00.0", 1L)))
  }

  test("watermarked windows: emitted once when passed, late events dropped") {
    val tmp = Files.createTempDirectory("graft_wm_").toFile.getAbsolutePath
    def ev(ts: String, amount: Double) =
      s"""{"ts":"2024-03-15T$ts","amount":$amount}"""
    def run(): Unit = {
      val q = StreamState.startWindowedVolume(spark, s"$tmp/landing",
        s"$tmp/out", s"$tmp/ckpt", availableNow = true)
      q.awaitTermination()
    }

    // batch 1: two events in [10:00,10:05), one at 10:20 to advance the
    // watermark to 10:10 (> window end) after the batch
    writeFile(s"$tmp/landing", "b1.json", Seq(
      ev("10:00:10", 10.0), ev("10:02:00", 20.0), ev("10:20:00", 5.0)))
    run()
    // batch 2: a LATE event for the already-passed window (dropped) plus
    // one more in [10:20,10:25); emits the finalized [10:00,10:05)
    writeFile(s"$tmp/landing", "b2.json", Seq(
      ev("10:01:00", 999.0), ev("10:21:00", 7.0)))
    run()
    // batch 3: advance the watermark past 10:25 to flush [10:20,10:25)
    writeFile(s"$tmp/landing", "b3.json", Seq(ev("10:40:00", 1.0)))
    run()

    val wins = spark.read.parquet(s"$tmp/out").collect()
      .map(r => r.getAs[java.sql.Timestamp]("window_start").toString ->
        (r.getAs[Long]("n_txns"), r.getAs[Double]("volume"))).toMap
    // late 999.0 event did NOT land in the emitted 10:00 window
    assert(wins("2024-03-15 10:00:00.0") == ((2L, 30.0)))
    assert(wins("2024-03-15 10:20:00.0") == ((2L, 12.0)))
  }
}
