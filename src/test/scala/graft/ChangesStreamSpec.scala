package graft

import java.nio.file.Paths

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, sum, when}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ManifestChanges, ManifestSink}

/** STREAMING CDF (r17): the GraftChanges micro-batch source streams
  * every committed generation as a row-level change set
  * (`_change_type`/`_commit_gen`), so MoR DML and compaction no longer
  * force streaming consumers to restart (the snapshot feed refuses on
  * both, by design). Invariants pinned here:
  *   - reconstruction: net-positive multiset of the drained change log
  *     equals the live table, across appends + delta UPDATE + tombstone
  *     DELETE + compaction;
  *   - one generation per micro-batch (commit boundaries = batch
  *     boundaries);
  *   - exactly-once across a checkpoint restart (no re-delivery, no
  *     gaps);
  *   - startingGen skips history; expired generations fail loudly.
  */
class ChangesStreamSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    s
  }

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_cdfstream_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  /** Drain the change feed AvailableNow into a named memory sink and
    * return (accumulated changes, batches with rows).
    */
  private def drain(root: String, sinkName: String,
      checkpoint: String, startingGen: Option[Long] = None,
      selectCols: Option[Seq[String]] = None): (DataFrame, Int) = {
    val r0 = spark.readStream.format("graft.sources.GraftChanges")
      .option("path", root)
    val r1 = startingGen.fold(r0)(g => r0.option("startingGen", g.toString))
    val src = r1.load()
    val proj = selectCols.fold(src)(cs => src.select(cs.map(col): _*))
    val q = proj.writeStream.format("memory").queryName(sinkName)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    (spark.table(sinkName), batches)
  }

  private def reconstruct(changes: DataFrame, cols: Seq[String]): Set[Seq[Any]] =
    changes.groupBy(cols.map(col): _*)
      .agg(sum(when(col("_change_type") === "insert", 1L)
        .otherwise(-1L)).as("net"))
      .filter(col("net") > 0L)
      .collect().map(r => cols.indices.map(r.get)).toSet

  private def state(root: String, cols: Seq[String]): Set[Seq[Any]] =
    ManifestSink.readCommitted(spark, root)
      .select(cols.map(col): _*)
      .collect().map(r => cols.indices.map(r.get)).toSet

  test("append-only history streams as pure inserts, one gen per batch") {
    import spark.implicits._
    val root = freshRoot("appends")
    (0 until 3).foreach { i =>
      (i * 10 until (i + 1) * 10).map(k => (k.toLong, s"v$k")).toDF("k", "v")
        .coalesce(1).write.format("graft.sources.ManifestSink")
        .mode(if (i == 0) "overwrite" else "append")
        .option("path", root).option("format", "parquet").save()
    }
    val (ch, batches) = drain(root, "cdfs_appends", s"$root/_cp")
    assert(ch.filter(col("_change_type") === "delete").count() == 0L)
    assert(ch.count() == 30L)
    // commit boundaries are batch boundaries
    assert(batches == ManifestSink.snapshots(root).size)
    assert(ch.select("_commit_gen").distinct().count() ==
      ManifestSink.snapshots(root).size.toLong)
    assert(reconstruct(ch, Seq("k", "v")) == state(root, Seq("k", "v")))
  }

  test("delta UPDATE + tombstone DELETE + compaction reconstruct the live table") {
    import spark.implicits._
    val root = freshRoot("dml")
    (0 until 40).map(k => (k.toLong, k % 4, s"v$k")).toDF("k", "m", "v")
      .coalesce(2).write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet").save()
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.cdfstream_dml")
    spark.sql(
      s"""CREATE TABLE graft_cat.lake.cdfstream_dml
         | (k BIGINT, m INT, v STRING)
         | USING graft OPTIONS (path '$root', format 'parquet',
         |  deleteMode 'mor')""".stripMargin)
    // delta UPDATE: position deletes + appended updates in one commit
    spark.sql("UPDATE graft_cat.lake.cdfstream_dml SET v = 'touched' WHERE m = 1")
    // MoR DELETE: predicate tombstone
    spark.sql("DELETE FROM graft_cat.lake.cdfstream_dml WHERE m = 2")
    // compaction rewrites everything (cancelling delete+insert pairs)
    ManifestSink.compact(spark, root)
    (100 until 110).map(k => (k.toLong, k % 4, s"v$k")).toDF("k", "m", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).option("format", "parquet").save()

    val (ch, batches) = drain(root, "cdfs_dml", s"$root/_cp")
    assert(batches == ManifestSink.snapshots(root).size)
    assert(reconstruct(ch, Seq("k", "m", "v")) == state(root, Seq("k", "m", "v")))
    // the streamed change log agrees row-for-row with the batch feed
    val top = ManifestSink.snapshots(root).last
    val batch = ManifestChanges.readChanges(spark, root, 0L, top)
    val cols = Seq("k", "m", "v", "_change_type", "_commit_gen")
    assert(ch.select(cols.map(col): _*).collect().map(_.toSeq).sorted(
      Ordering.by((s: Seq[Any]) => s.mkString("|"))).toSeq ==
      batch.select(cols.map(col): _*).collect().map(_.toSeq).sorted(
        Ordering.by((s: Seq[Any]) => s.mkString("|"))).toSeq)
  }

  /** foreachBatch accumulation (the memory sink refuses checkpoint
    * recovery, so restart tests go through a durable sink).
    */
  private def drainTo(root: String, out: String, checkpoint: String): Unit = {
    val q = spark.readStream.format("graft.sources.GraftChanges")
      .option("path", root).load()
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("a rollback commit streams its revived rows as inserts and agrees " +
      "with the batch feed (r19 rollback)") {
    import spark.implicits._
    val root = freshRoot("rollback")
    (0 until 40).map(k => (k.toLong, k % 4, s"v$k")).toDF("k", "m", "v")
      .coalesce(2).write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet").save()
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.cdfstream_rb")
    spark.sql(
      s"""CREATE TABLE graft_cat.lake.cdfstream_rb
         | (k BIGINT, m INT, v STRING)
         | USING graft OPTIONS (path '$root', format 'parquet',
         |  deleteMode 'mor')""".stripMargin)
    val good = ManifestSink.snapshots(root).last
    // both revived flavors: a position-delete UPDATE and a predicate
    // tombstone, rolled back in one metadata-only commit
    spark.sql("UPDATE graft_cat.lake.cdfstream_rb SET v = 'bad' WHERE m = 1")
    spark.sql("DELETE FROM graft_cat.lake.cdfstream_rb WHERE m = 2")
    ManifestSink.rollback(root, good)

    val (ch, batches) = drain(root, "cdfs_rb", s"$root/_cp")
    assert(batches == ManifestSink.snapshots(root).size)
    // the stream nets to the rolled-back (= live) state
    assert(reconstruct(ch, Seq("k", "m", "v")) == state(root, Seq("k", "m", "v")))
    // the rollback batch itself resurrects the m=2 tombstoned rows and
    // the m=1 originals (inserts, original payloads)
    val top = ManifestSink.snapshots(root).last
    val rb = ch.filter(col("_commit_gen") === top)
    assert(rb.filter(col("_change_type") === "insert" &&
      col("m") === 2).count() == 10L)
    assert(rb.filter(col("_change_type") === "insert" &&
      col("m") === 1 && col("v") =!= "bad").count() == 10L)
    // change-for-change agreement with the batch feed
    val batch = ManifestChanges.readChanges(spark, root, 0L, top)
    val cols = Seq("k", "m", "v", "_change_type", "_commit_gen")
    assert(ch.select(cols.map(col): _*).collect().map(_.toSeq).sorted(
      Ordering.by((s: Seq[Any]) => s.mkString("|"))).toSeq ==
      batch.select(cols.map(col): _*).collect().map(_.toSeq).sorted(
        Ordering.by((s: Seq[Any]) => s.mkString("|"))).toSeq)
  }

  test("checkpoint restart resumes exactly-once across later DML") {
    import spark.implicits._
    val root = freshRoot("resume")
    (0 until 20).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet").save()
    (20 until 40).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).option("format", "parquet").save()
    val cp = s"$root/_cp"
    drainTo(root, s"$root/_out_a", cp)
    val first = spark.read.parquet(s"$root/_out_a")
    assert(first.count() == 40L)
    // DML lands AFTER the consumer's offset — a tombstone on carried
    // files (the snapshot feed would refuse here; the CDF must resume)
    graft.sources.ManifestSink.deleteWhereMoR(root,
      Array(org.apache.spark.sql.sources.LessThan("k", 5L)))
    (40 until 45).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).option("format", "parquet").save()
    drainTo(root, s"$root/_out_b", cp)
    val second = spark.read.parquet(s"$root/_out_b")
    // same checkpoint: only the NEW windows land in the second sink
    assert(second.filter(col("_change_type") === "delete").count() == 5L)
    assert(second.filter(col("_change_type") === "insert").count() == 5L)
    // first + second = the full batch change log (exactly-once resume)
    val all = first.unionByName(second)
    assert(reconstruct(all, Seq("k", "v")) == state(root, Seq("k", "v")))
  }

  test("startingGen skips history; column pruning serves a subset") {
    import spark.implicits._
    val root = freshRoot("fromgen")
    (0 until 10).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet").save()
    val g1 = ManifestSink.snapshots(root).last
    (10 until 15).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).option("format", "parquet").save()
    val (ch, _) = drain(root, "cdfs_fromgen", s"$root/_cp1",
      startingGen = Some(g1),
      selectCols = Some(Seq("k", "_change_type", "_commit_gen")))
    assert(ch.columns.toSeq == Seq("k", "_change_type", "_commit_gen"))
    assert(ch.count() == 5L)
    assert(ch.agg(org.apache.spark.sql.functions.min("k")).head.getLong(0) == 10L)
  }

  test("vacuumed history from gen 0 degrades to a correct net window; " +
      "an expired CONSUMED offset fails loudly") {
    import spark.implicits._
    val root = freshRoot("expired")
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("k", "v")
        .coalesce(1).write.format("graft.sources.ManifestSink")
        .mode(if (i == 0) "overwrite" else "append")
        .option("path", root).option("format", "parquet").save()
    }
    // consume up to the live generation, then expire it from retention
    val cp = s"$root/_cp"
    drainTo(root, s"$root/_out", cp)
    assert(spark.read.parquet(s"$root/_out").count() == 4L)
    (10 until 12).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("k", "v")
        .coalesce(1).write.format("graft.sources.ManifestSink")
        .mode("append").option("path", root).option("format", "parquet").save()
    }
    ManifestSink.vacuum(root, retainSnapshots = 1)
    // a FRESH consumer from gen 0 over the vacuumed history sees one
    // merged net window — reconstruction still equals the live state
    // (same degradation as batch readChanges from 0)
    val (fresh, _) = drain(root, "cdfs_vacuumed_fresh", s"$root/_cp_fresh")
    assert(reconstruct(fresh, Seq("k", "v")) == state(root, Seq("k", "v")))
    // but the EXISTING consumer's committed offset expired — loud failure
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainTo(root, s"$root/_out2", cp)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("expired")))
  }

  test("a stream started after a reservation-clearing rewrite does not " +
      "trip the vintage guard (ADVICE r18)") {
    import spark.implicits._
    val root = freshRoot("reuse")
    (0 until 10).map(k => (k.toLong, s"p$k")).toDF("k", "payload")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet").save()
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.cdfs_reuse")
    spark.sql(
      s"""CREATE TABLE graft_cat.lake.cdfs_reuse (k BIGINT, payload STRING)
         | USING graft OPTIONS (path '$root', format 'parquet')""".stripMargin)
    spark.sql(
      "ALTER TABLE graft_cat.lake.cdfs_reuse RENAME COLUMN payload TO body")
    ManifestSink.compact(spark, root) // releases the 'payload' reservation
    spark.sql("ALTER TABLE graft_cat.lake.cdfs_reuse ADD COLUMN payload STRING")
    val afterRewrite = ManifestSink.snapshots(root).last
    Seq((100L, "b", "p2")).toDF("k", "body", "payload")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).option("format", "parquet").save()
    // pre-fix, stream CONSTRUCTION accumulated evolution over ALL
    // retained snapshots and threw 'ambiguous evolution history' even
    // though this feed never replays the pre-rewrite vintage
    val (ch, _) = drain(root, "cdfs_reuse_after", s"$root/_cp_after",
      startingGen = Some(afterRewrite))
    assert(ch.count() == 1L)
    assert(ch.columns.contains("payload"))
    assert(ch.filter(col("payload") === "p2").count() == 1L)
    // a stream from gen 0 still refuses — it genuinely spans two
    // 'payload' vintages (same contract as the batch feed)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft.sources.GraftChanges")
        .option("path", root).load()
        .writeStream.format("memory").queryName("cdfs_reuse_zero")
        .option("checkpointLocation", s"$root/_cp_zero")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    assert(msgs(ex).exists(_.contains("ambiguous evolution history")))
  }

  test("startingTimestamp resolves through commit instants; the boundary " +
      "commit is starting state (VERDICT r17 Next #4)") {
    import spark.implicits._
    val root = freshRoot("fromts")
    (0 until 10).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet").save()
    val (g1, t1) = ManifestSink.snapshotTimestamps(root).last
    // the second commit must land on a LATER millisecond or the
    // boundary assertion below is vacuous
    while (System.currentTimeMillis() <= t1 + 1) Thread.sleep(2)
    (10 until 15).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).option("format", "parquet").save()
    val g2 = ManifestSink.snapshots(root).last
    assert(g2 != g1)
    // resolution helper: boundary instant resolves TO its generation
    // (that commit is starting STATE, its changes do not replay)
    def spec(kv: (String, String)*) =
      graft.sources.GraftChanges.startSpec(kv.toMap.get)
    assert(graft.sources.GraftChanges.resolveStartingGen(root,
      spec("startingTimestamp" -> t1.toString), strict = true) == g1)
    val q = spark.readStream.format("graft.sources.GraftChanges")
      .option("path", root).option("startingTimestamp", t1.toString).load()
      .writeStream.format("memory").queryName("cdfs_fromts")
      .option("checkpointLocation", s"$root/_cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("cdfs_fromts")
    assert(got.count() == 5L)
    assert(got.agg(org.apache.spark.sql.functions.min("k")).head.getLong(0) == 10L)
    assert(got.select("_commit_gen").distinct().head.getLong(0) == g2)
    // pre-history refuses loudly on a FRESH start (expired history
    // could hide changes) but resolves leniently to 0 at construction —
    // a checkpointed restart must survive vacuum (code-review r18)
    val pre = intercept[IllegalArgumentException] {
      graft.sources.GraftChanges.resolveStartingGen(root,
        spec("startingTimestamp" -> (t1 - 60000L).toString), strict = true)
    }
    assert(pre.getMessage.contains("precedes every retained commit"))
    assert(graft.sources.GraftChanges.resolveStartingGen(root,
      spec("startingTimestamp" -> (t1 - 60000L).toString),
      strict = false) == 0L)
    // and the two knobs are mutually exclusive
    val both = intercept[IllegalArgumentException] {
      spec("startingTimestamp" -> t1.toString, "startingGen" -> g1.toString)
    }
    assert(both.getMessage.contains("not both"))
  }

  test("startingTimestamp accepts timestamp strings and fails loudly on " +
      "garbage, naming the option (ADVICE r18)") {
    import graft.sources.GraftChanges.parseStartingTimestamp
    // epoch millis pass through
    assert(parseStartingTimestamp("1700000000000") == 1700000000000L)
    // ISO instant, SQL shape (UTC), and bare date all resolve to the
    // same instant
    assert(parseStartingTimestamp("2026-01-02T03:04:05Z") ==
      java.time.Instant.parse("2026-01-02T03:04:05Z").toEpochMilli)
    assert(parseStartingTimestamp("2026-01-02 03:04:05") ==
      parseStartingTimestamp("2026-01-02T03:04:05Z"))
    assert(parseStartingTimestamp("2026-01-02") ==
      parseStartingTimestamp("2026-01-02T00:00:00Z"))
    // garbage names the option and the accepted shapes — pre-fix this
    // surfaced as a bare NumberFormatException at table load
    val bad = intercept[IllegalArgumentException](
      parseStartingTimestamp("not-a-time"))
    assert(bad.getMessage.contains("startingTimestamp"))
    assert(bad.getMessage.contains("epoch millis"))
    // startingGen gets the same courtesy
    val badGen = intercept[IllegalArgumentException](
      graft.sources.GraftChanges.startSpec(
        Map("startingGen" -> "three").get))
    assert(badGen.getMessage.contains("startingGen"))
  }

  test("a checkpointed startingTimestamp stream restarts after vacuum " +
      "expires its resolution window (code-review r18)") {
    import spark.implicits._
    val root = freshRoot("tsrestart")
    (0 until 10).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet").save()
    val (_, t1) = ManifestSink.snapshotTimestamps(root).last
    val cp = s"$root/_cp"
    def drainTs(out: String): Unit = {
      val q = spark.readStream.format("graft.sources.GraftChanges")
        .option("path", root).option("startingTimestamp", t1.toString).load()
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    while (System.currentTimeMillis() <= t1 + 1) Thread.sleep(2)
    (10 until 15).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).option("format", "parquet").save()
    drainTs(s"$root/_out_a")
    assert(spark.read.parquet(s"$root/_out_a").count() == 5L)
    // vacuum to the live state only: the commits at or before t1 expire
    ManifestSink.vacuum(root, retainSnapshots = 1)
    (15 until 18).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).option("format", "parquet").save()
    // pre-fix this restart threw 'precedes every retained commit' at
    // source construction; the checkpoint, not the timestamp, owns the
    // position — only the NEW window may stream
    drainTs(s"$root/_out_b")
    val second = spark.read.parquet(s"$root/_out_b")
    assert(second.count() == 3L)
    assert(second.agg(org.apache.spark.sql.functions.min("k"))
      .head.getLong(0) == 15L)
  }

  test("gensPerBatch amortizes catch-up while keeping per-gen attribution") {
    import spark.implicits._
    val root = freshRoot("catchup")
    (0 until 6).foreach { i =>
      ((i * 5) until ((i + 1) * 5)).map(k => (k.toLong, s"v$k")).toDF("k", "v")
        .coalesce(1).write.format("graft.sources.ManifestSink")
        .mode(if (i == 0) "overwrite" else "append")
        .option("path", root).option("format", "parquet").save()
    }
    val q = spark.readStream.format("graft.sources.GraftChanges")
      .option("path", root).option("gensPerBatch", "3").load()
      .writeStream.format("memory").queryName("cdfs_catchup")
      .option("checkpointLocation", s"$root/_cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches == 2) // 6 generations / 3 per batch
    val got = spark.table("cdfs_catchup")
    assert(got.count() == 30L)
    // per-generation attribution survives window coalescing
    assert(got.select("_commit_gen").distinct().count() ==
      ManifestSink.snapshots(root).size.toLong)
    assert(reconstruct(got, Seq("k", "v")) == state(root, Seq("k", "v")))
  }
}
