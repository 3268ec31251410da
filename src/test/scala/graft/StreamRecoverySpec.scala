package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Checkpoint recovery — the exactly-once property the streaming family
  * leans on, demonstrated ACROSS RESTARTS (every registered q_stream_*
  * runs AvailableNow to completion in one JVM, so the recovery path —
  * the one production actually exercises — would otherwise go untested):
  * a query processes one landing file, STOPS, more data lands, and a new
  * query started from the SAME checkpoint must emit exactly the new rows
  * — no loss, no replay — for both the file sink (commit-log dedup) and
  * a stateful complete-mode aggregation (state restore).
  */
class StreamRecoverySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  private def tmp(): String =
    Files.createTempDirectory("graft-recovery").toString

  private def writeBatch(dir: String, name: String, rows: Seq[(Long, Long)]): Unit = {
    val body = rows.map { case (k, v) => s"""{"k":$k,"v":$v}""" }.mkString("\n")
    val f = java.nio.file.Paths.get(dir, name)
    Files.write(f, body.getBytes("UTF-8"))
  }

  private def runOnce(landing: String, ckpt: String, out: String): Unit = {
    val q = spark.readStream.schema(schema).json(landing)
      .select(col("k"), col("v"), (col("v") * 2).as("v2"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("file-sink stream resumes from its checkpoint with no loss and no replay") {
    val landing = tmp(); val ckpt = s"${tmp()}/ckpt"; val out = s"${tmp()}/out"
    writeBatch(landing, "b0.json", (1L to 50L).map(i => (i, i * 10)))
    runOnce(landing, ckpt, out)
    val first = spark.read.schema(StructType(schema.fields :+
        StructField("v2", LongType))).parquet(out)
    assert(first.count() == 50L)
    // more data lands; a NEW query from the SAME checkpoint picks up
    // exactly the delta
    writeBatch(landing, "b1.json", (51L to 80L).map(i => (i, i * 10)))
    runOnce(landing, ckpt, out)
    val all = spark.read.schema(StructType(schema.fields :+
        StructField("v2", LongType))).parquet(out).collect()
    assert(all.length == 80L, s"expected 80 rows exactly once, got ${all.length}")
    assert(all.map(_.getLong(0)).toSet == (1L to 80L).toSet)
    all.foreach(r => assert(r.getLong(2) == r.getLong(1) * 2))
  }

  test("stateful complete-mode aggregation restores its state store on restart") {
    val landing = tmp(); val ckpt = s"${tmp()}/ckpt"; val out = s"${tmp()}/out"
    def runAgg(): Unit = {
      val q = spark.readStream.schema(schema).json(landing)
        .groupBy(col("k") % 3).agg(sum(col("v")).as("s"))
        .toDF("g", "s")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("overwrite").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeBatch(landing, "b0.json", (1L to 30L).map(i => (i, i)))
    runAgg()
    writeBatch(landing, "b1.json", (31L to 60L).map(i => (i, i)))
    runAgg()
    val got = spark.read.schema(StructType(Seq(StructField("g", LongType),
        StructField("s", LongType)))).parquet(out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (1L to 60L).groupBy(_ % 3).view.mapValues(_.sum).toMap
    assert(got == expect, s"state not restored: $got vs $expect")
  }
}
