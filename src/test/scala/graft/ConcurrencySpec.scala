package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestSink

/** Optimistic commit concurrency (VERDICT r15 Next #4): replace-shaped
  * commits (overwrite, DELETE/MERGE rewrites, compaction) carry the
  * generation they were planned against and FAIL loudly when a
  * concurrent commit moved the table past it — the table never tears
  * and never silently drops the interleaved commit's rows. Append-
  * shaped commits merge cleanly (their file sets are disjoint by job
  * token and the per-root commit lock serializes read-modify-publish).
  */
class ConcurrencySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_conc_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  private def rootCause(t: Throwable): Throwable =
    if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)

  test("a stale overwrite loses the CAS loudly; the table never tears") {
    import spark.implicits._
    val root = freshRoot("stale_ow")
    Seq((1L, "a")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    Seq((2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).save()
    assert(ManifestSink.snapshots(root).last == 2L)
    val filesBefore = ManifestSink.committedFiles(root).toSet
    // an overwrite planned against generation 1 — the table has moved on
    val err = intercept[Exception] {
      Seq((9L, "stale")).toDF("k", "v").coalesce(1)
        .write.format("graft.sources.ManifestSink")
        .mode("overwrite").option("path", root)
        .option("expectedGen", "1").save()
    }
    assert(rootCause(err).isInstanceOf[java.util.ConcurrentModificationException],
      s"expected a CAS failure, got: $err")
    assert(rootCause(err).getMessage.contains("generation 1"),
      s"the error must name the stale base: ${rootCause(err).getMessage}")
    // the losing commit changed nothing: same files, same generation,
    // and its staged output was aborted away
    assert(ManifestSink.committedFiles(root).toSet == filesBefore)
    assert(ManifestSink.snapshots(root).last == 2L)
    val staging = Paths.get(root, "_staging")
    assert(!Files.exists(staging) || {
      val s = Files.list(staging)
      try !s.iterator().hasNext finally s.close()
    }, "the loser's staged files must be aborted away")
    assert(ManifestSink.readCommitted(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("a stale row-level rewrite (replaceFiles) loses the CAS loudly") {
    import spark.implicits._
    val root = freshRoot("stale_rw")
    Seq((1L, "a")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    val victim = ManifestSink.committedFiles(root).head
    val victimName = Paths.get(victim).getFileName.toString
    Seq((2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).save()
    val err = intercept[Exception] {
      Seq((1L, "rewritten")).toDF("k", "v").coalesce(1)
        .write.format("graft.sources.ManifestSink")
        .mode("append").option("path", root)
        .option("replaceFiles", victimName)
        .option("expectedGen", "1").save()
    }
    assert(rootCause(err).isInstanceOf[java.util.ConcurrentModificationException])
    assert(ManifestSink.readCommitted(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b")), "the losing rewrite must change nothing")
  }

  test("an append-shaped commit with a moved base merges cleanly") {
    import spark.implicits._
    val root = freshRoot("stale_app")
    Seq((1L, "a")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    Seq((2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).save()
    // planned against gen 1, committing at gen 2: appends are disjoint
    // by job token and re-read the live prior list under the lock —
    // they proceed rather than fail
    Seq((3L, "c")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root)
      .option("expectedGen", "1").save()
    assert(ManifestSink.readCommitted(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("two interleaved appends both land: the commit lock serializes the swap") {
    import spark.implicits._
    val root = freshRoot("race_app")
    Seq((0L, "base")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        try Seq((i.toLong, s"t$i")).toDF("k", "v").coalesce(1)
          .write.format("graft.sources.ManifestSink")
          .mode("append").option("path", root).save()
        catch { case t: Throwable => errs.add(t); () }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent appends must all succeed: ${errs.peek()}")
    assert(ManifestSink.readCommitted(spark, root)
      .collect().map(_.getLong(0)).toSet == (0L to 4L).toSet,
      "every append's rows must survive the race")
    assert(ManifestSink.snapshots(root).size == 5,
      "each commit publishes its own generation")
  }
}
