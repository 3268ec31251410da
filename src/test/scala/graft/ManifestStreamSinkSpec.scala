package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ManifestSink, ManifestStreamingWrite, ManifestStreamingWriterFactory}

/** The StreamingWrite face's exactly-once contract, pinned at protocol
  * level by driving the writer/commit machinery directly (no Spark
  * scheduler in the loop, so each claim is tested in isolation):
  * mid-epoch staged data is invisible, a replayed epoch commit is a
  * no-op (checkpoint-recovery non-duplication), epochs APPEND rather
  * than replace, and abort removes the epoch's staged files.
  */
class ManifestStreamSinkSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_manifest_stream_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    Files.createDirectories(p)
    p.toString
  }

  /** Stage one epoch's rows through the real factory + writer and return
    * the task commit messages (the driver commit is the caller's move).
    */
  private def stageEpoch(root: String, epochId: Long, taskId: Long,
      rows: Seq[(Long, String)]): Array[WriterCommitMessage] = {
    val w = new ManifestStreamingWriterFactory(root, schema)
      .createWriter(0, taskId, epochId)
    rows.foreach { case (k, v) =>
      w.write(InternalRow.fromSeq(Seq(k, UTF8String.fromString(v))))
    }
    Array(w.commit())
  }

  private def visibleKeys(root: String): Set[Long] =
    ManifestSink.readCommitted(spark, root) match {
      case df if ManifestSink.committedFiles(root).isEmpty => Set.empty[Long]
      case df => df.collect().map(_.getLong(0)).toSet
    }

  test("mid-epoch staged data is invisible until the driver commit") {
    val root = freshRoot("midepoch")
    val sw = new ManifestStreamingWrite(root, schema)
    val msgs = stageEpoch(root, 0L, 100L, Seq(1L -> "a", 2L -> "b"))
    assert(ManifestSink.committedFiles(root).isEmpty,
      "staged epoch leaked before the driver commit")
    sw.commit(0L, msgs)
    assert(visibleKeys(root) == Set(1L, 2L))
    assert(ManifestSink.committedEpochs(root) == Set(0L))
  }

  test("replayed epoch commit is a no-op: no duplicates, staged re-run dropped") {
    val root = freshRoot("replay")
    val sw = new ManifestStreamingWrite(root, schema)
    sw.commit(0L, stageEpoch(root, 0L, 100L, Seq(1L -> "a", 2L -> "b")))
    val manifestBefore = Files.readAllLines(
      Paths.get(root).resolve("manifest.json"))
    // checkpoint recovery re-runs the last batch: same epoch id, fresh
    // task ids, commit called AGAIN — Spark's documented replay shape
    val replayMsgs = stageEpoch(root, 0L, 999L, Seq(1L -> "a", 2L -> "b"))
    sw.commit(0L, replayMsgs)
    assert(Files.readAllLines(Paths.get(root).resolve("manifest.json"))
        == manifestBefore,
      "replayed epoch must not touch the manifest")
    assert(visibleKeys(root) == Set(1L, 2L), "replay double-published")
    val staged = Option(Paths.get(root).resolve("_staging").toFile.listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
    assert(staged.isEmpty, s"replayed staged files not cleaned: $staged")
  }

  test("epochs append; readback sees every committed epoch exactly once") {
    val root = freshRoot("append")
    val sw = new ManifestStreamingWrite(root, schema)
    sw.commit(0L, stageEpoch(root, 0L, 1L, Seq(1L -> "a")))
    sw.commit(1L, stageEpoch(root, 1L, 2L, Seq(2L -> "b")))
    sw.commit(2L, stageEpoch(root, 2L, 3L, Seq(3L -> "c")))
    assert(ManifestSink.committedEpochs(root) == Set(0L, 1L, 2L))
    assert(visibleKeys(root) == Set(1L, 2L, 3L))
    val rows = ManifestSink.readCommitted(spark, root).collect()
    assert(rows.length == 3, s"epoch append duplicated rows: ${rows.length}")
  }

  test("compaction preserves the epoch ledger: replay detection survives rewrite") {
    val root = freshRoot("compactledger")
    val sw = new ManifestStreamingWrite(root, schema)
    sw.commit(0L, stageEpoch(root, 0L, 1L, Seq(1L -> "a")))
    sw.commit(1L, stageEpoch(root, 1L, 2L, Seq(2L -> "b")))
    sw.commit(2L, stageEpoch(root, 2L, 3L, Seq(3L -> "c")))
    assert(ManifestSink.committedFiles(root).size == 3)

    ManifestSink.compact(spark, root)
    assert(ManifestSink.committedFiles(root).size == 1)
    // the epoch ids lived in the e<id>- file-name prefixes compaction
    // just rewrote — they must survive as #e: ledger lines, or a resumed
    // streaming query's checkpoint replay would double-publish
    assert(ManifestSink.committedEpochs(root) == Set(0L, 1L, 2L),
      "compaction lost the epoch ledger")
    val manifestBefore = Files.readAllLines(
      Paths.get(root).resolve("manifest.json"))
    sw.commit(1L, stageEpoch(root, 1L, 99L, Seq(2L -> "b")))
    assert(Files.readAllLines(Paths.get(root).resolve("manifest.json"))
        == manifestBefore,
      "replayed epoch after compaction must still be a no-op")
    assert(visibleKeys(root) == Set(1L, 2L, 3L))
    // a NEW epoch still appends alongside the ledger
    sw.commit(3L, stageEpoch(root, 3L, 4L, Seq(4L -> "d")))
    assert(ManifestSink.committedEpochs(root) == Set(0L, 1L, 2L, 3L))
    assert(visibleKeys(root) == Set(1L, 2L, 3L, 4L))
    ManifestSink.vacuum(root)
    assert(visibleKeys(root) == Set(1L, 2L, 3L, 4L))
  }

  test("snapshot feed: one generation per batch, each row delivered exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val root = freshRoot("feed")
    Seq(Seq(1L -> "a", 2L -> "b"), Seq(3L -> "c"), Seq(4L -> "d", 5L -> "e"))
      .foreach { batch =>
        batch.toDF("k", "v").write.format("graft.sources.ManifestSink")
          .mode("append").option("path", root).save()
      }
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = spark.readStream.format("graft.sources.ManifestSink")
      .option("path", root).load()
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        batches.synchronized {
          batches += df.select("k").collect().map(_.getLong(0)).toSet
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // commit boundaries ARE batch boundaries: 3 generations -> 3 batches
    // carrying exactly each commit's change set, nothing doubled or lost
    assert(batches.toSeq == Seq(Set(1L, 2L), Set(3L), Set(4L, 5L)),
      s"snapshot feed diffs wrong: $batches")
    // an expired generation fails the feed LOUDLY (retention contract)
    val stream = new graft.sources.ManifestSnapshotStream(root,
      Seq((1L, "a")).toDF("k", "v").schema, Seq((1L, "a")).toDF("k", "v").schema)
    val gens = ManifestSink.snapshots(root)
    ManifestSink.vacuum(root, retainSnapshots = 1)
    intercept[IllegalStateException] {
      stream.planInputPartitions(
        graft.sources.SnapshotOffset(0L), graft.sources.SnapshotOffset(gens.head))
    }
  }

  test("snapshot feed resumes from its checkpoint: only new generations replay") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val root = freshRoot("feedresume")
    val ckpt = s"$root/_feed_checkpoint"
    def append(rows: Seq[(Long, String)]): Unit =
      rows.toDF("k", "v").write.format("graft.sources.ManifestSink")
        .mode("append").option("path", root).save()
    def drain(): Seq[Set[Long]] = {
      val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
      val q = spark.readStream.format("graft.sources.ManifestSink")
        .option("path", root).load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          batches.synchronized {
            batches += df.select("k").collect().map(_.getLong(0)).toSet
          }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      batches.toSeq
    }
    append(Seq(1L -> "a", 2L -> "b"))
    append(Seq(3L -> "c"))
    assert(drain() == Seq(Set(1L, 2L), Set(3L)))
    // new commits after the first drain: the resumed query must replay
    // ONLY them — the SnapshotOffset round-tripped the checkpoint log
    append(Seq(4L -> "d"))
    assert(drain() == Seq(Set(4L)), "resume replayed or skipped a generation")
    // nothing new: an empty drain, not a duplicate
    assert(drain().forall(_.isEmpty))
  }

  test("abort removes the epoch's staged files and publishes nothing") {
    val root = freshRoot("abort")
    val sw = new ManifestStreamingWrite(root, schema)
    val msgs = stageEpoch(root, 5L, 7L, Seq(9L -> "x"))
    sw.abort(5L, msgs)
    val staged = Option(Paths.get(root).resolve("_staging").toFile.listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
    assert(staged.isEmpty && ManifestSink.committedFiles(root).isEmpty)
  }
}
