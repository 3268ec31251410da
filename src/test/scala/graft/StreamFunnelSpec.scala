package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamQueries

/** ST4 restart proof for the streaming funnel: the per-user stage state
  * (first qualifying view/click/purchase times) must survive a query
  * restart from the checkpoint, and the temporal qualification rule
  * (stage k only at-or-after stage k-1) must hold across batches.
  */
class StreamFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ev(uid: Long, id: Long, tpe: String, us: Long): String =
    s"""{"user_id":$uid,"event_id":$id,"event_type":"$tpe","us":$us}"""

  private def writeFile(dir: String, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes("UTF-8"))
    ()
  }

  test("funnel stage state survives restart; qualification stays temporal") {
    val tmp = Files.createTempDirectory("graft_funnel_").toFile.getAbsolutePath
    // run 1: u1 views; u2 arrives out of order (purchase, click before view);
    // u3 has a click BEFORE its view (must not qualify)
    writeFile(s"$tmp/landing", "b1.json", Seq(
      ev(1, 10, "view", 1000),
      ev(2, 20, "purchase", 100), ev(2, 21, "click", 200), ev(2, 22, "view", 300),
      ev(3, 30, "click", 50), ev(3, 31, "view", 100)))
    val q1 = StreamQueries.startFunnel(spark, s"$tmp/landing", s"$tmp/out", s"$tmp/ckpt")
    q1.awaitTermination()

    // run 2 (restart): u1 completes using the checkpointed t1; u3's new
    // click at 150 >= view 100 qualifies, then purchase at 160
    writeFile(s"$tmp/landing", "b2.json", Seq(
      ev(1, 11, "click", 2000), ev(1, 12, "purchase", 3000),
      ev(3, 32, "click", 150), ev(3, 33, "purchase", 160)))
    val q2 = StreamQueries.startFunnel(spark, s"$tmp/landing", s"$tmp/out", s"$tmp/ckpt")
    q2.awaitTermination()

    val fin = spark.read.parquet(s"$tmp/out")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("t1").as("t1"),
        org.apache.spark.sql.functions.max("t2").as("t2"),
        org.apache.spark.sql.functions.max("t3").as("t3"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    assert(fin(1L) == ((1000L, 2000L, 3000L)), s"u1 must complete across restart: ${fin(1L)}")
    // u2: view at 300 is the first stage; the earlier click/purchase must not count
    assert(fin(2L) == ((300L, -1L, -1L)), s"u2 pre-view events must not qualify: ${fin(2L)}")
    // u3: click@50 (before view@100) rejected; click@150 qualifies post-restart
    assert(fin(3L) == ((100L, 150L, 160L)), s"u3: ${fin(3L)}")
  }
}
