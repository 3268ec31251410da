package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualNullSafe, StringContains}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LakeTestAccess, ManifestSink, ManifestStreamingWrite, ManifestTable}

/** Regression pins for the four ADVICE r16 findings:
  *
  *   1. segment IMMUTABILITY is enforced (refuse-to-overwrite + per-run
  *      random streaming segment tokens) — a fresh-checkpoint streaming
  *      run re-using epoch 0 after an overwrite can no longer clobber
  *      the old run's segment that retained snapshots still reference;
  *   2. copy-on-write deleteWhere REFUSES untranslatable filters loudly
  *      (a dropped filter would widen the delete to the whole candidate
  *      set) and translates EqualNullSafe;
  *   3. tombstone application throws on an untranslatable predicate
  *      instead of silently resurrecting deleted rows;
  *   4. the JSON writer's size-roll counts UTF-8 bytes, not UTF-16
  *      chars (CJK data was overshooting targetFileBytes ~3×).
  */
class SegmentDeleteSafetySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_segsafety_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    Files.createDirectories(p)
    p.toString
  }

  private def commitEpoch(root: String, sw: ManifestStreamingWrite,
      epochId: Long, rows: Seq[(Long, String)]): Unit = {
    // the factory must come from the write instance — it carries the
    // per-run token that makes segment AND data file names run-unique
    val w = sw.createStreamingWriterFactory(
      new org.apache.spark.sql.connector.write.PhysicalWriteInfo {
        override def numPartitions(): Int = 1
      }).createWriter(0, 0L, epochId)
    rows.foreach { case (k, v) =>
      w.write(InternalRow.fromSeq(Seq(k, UTF8String.fromString(v))))
    }
    sw.commit(epochId, Array(w.commit()))
  }

  test("writeSegment refuses to overwrite an existing segment") {
    val root = Paths.get(freshRoot("seg_immutable"))
    LakeTestAccess.writeSegment(root, "tok1", Seq("a.json", "#s:x"))
    val err = intercept[IllegalStateException] {
      LakeTestAccess.writeSegment(root, "tok1", Seq("b.json"))
    }
    assert(err.getMessage.contains("immutable"))
    // the original content is untouched
    assert(LakeTestAccess.segmentLines(root, "seg-tok1.json") ==
      Seq("a.json", "#s:x"))
  }

  test("a fresh streaming run re-using epoch 0 after an overwrite " +
      "cannot clobber the old run's segment (time travel survives)") {
    val root = freshRoot("epoch_reuse")
    // run 1: streaming epoch 0 commits rows {1,2}
    commitEpoch(root, new ManifestStreamingWrite(root, schema), 0L,
      Seq((1L, "a"), (2L, "b")))
    val gen1 = ManifestSink.snapshots(root).last
    // a batch OVERWRITE replaces the live list (epoch ledger cleared)
    import spark.implicits._
    Seq((9L, "ow")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    // run 2: a NEW query (fresh checkpoint) re-uses epoch 0 — before the
    // fix its deterministic seg-e0.json name silently clobbered run 1's
    commitEpoch(root, new ManifestStreamingWrite(root, schema), 0L,
      Seq((7L, "x")))
    // the retained snapshot of run 1 still reads its original rows
    val old = ManifestSink.readSnapshot(spark, root, gen1)
      .collect().map(_.getLong(0)).toSet
    assert(old == Set(1L, 2L), s"time travel corrupted: $old")
    // and the live table sees overwrite + run-2 epoch
    val live = ManifestSink.readCommitted(spark, root)
      .collect().map(_.getLong(0)).toSet
    assert(live == Set(9L, 7L))
  }

  test("CoW deleteWhere refuses an untranslatable filter loudly") {
    val root = freshRoot("cow_refuse")
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    val t = new ManifestTable(root, schema)
    val err = intercept[IllegalArgumentException] {
      t.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        StringContains("v", "a")))
    }
    assert(err.getMessage.contains("unsupported CoW delete predicate"))
    // nothing was deleted
    assert(ManifestSink.readCommitted(spark, root).count() == 2L)
  }

  test("EqualNullSafe deletes translate on both CoW and MoR paths") {
    import spark.implicits._
    // CoW
    val cow = freshRoot("eqns_cow")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", cow).save()
    new ManifestTable(cow, schema).deleteWhere(
      Array[org.apache.spark.sql.sources.Filter](EqualNullSafe("k", 2L)))
    assert(ManifestSink.readCommitted(spark, cow)
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // MoR: the tombstone grammar's `eqns` op round-trips AND the read
    // side translates it (before the fix, filterToColumn silently
    // dropped it — ADVICE r16 #3's resurrection hazard)
    val mor = freshRoot("eqns_mor")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", mor).save()
    assert(ManifestSink.deleteWhereMoR(mor, Array(EqualNullSafe("k", 2L))))
    assert(ManifestSink.readCommitted(spark, mor)
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // compaction folds the eqns tombstone cleanly too
    ManifestSink.compact(spark, mor)
    assert(ManifestSink.readCommitted(spark, mor)
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("targetFileBytes roll counts UTF-8 bytes: CJK data stays near the bound") {
    val root = freshRoot("cjk_roll")
    import spark.implicits._
    // ~120 UTF-8 bytes per row (40 CJK chars × 3 bytes), 300 rows
    val cjk = "世界和平" * 10
    (1L to 300L).map(i => (i, cjk)).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("targetFileBytes", "4096").save()
    val files = ManifestSink.committedFiles(root)
    assert(files.length > 1, "the roll must have fired")
    val sizes = files.map(f => Files.size(Paths.get(f)))
    // before the fix char-counting rolled near 3× the target; the seal
    // fires after crossing the bound, so allow one-row overshoot
    assert(sizes.forall(_ <= 4096L + 300L),
      s"roll overshot the byte bound: $sizes")
    assert(ManifestSink.readCommitted(spark, root).count() == 300L)
  }
}
