package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{LakeTestAccess, ManifestRead, ManifestSink}

/** SEGMENT-LEVEL PRUNING (VERDICT r16 Next #1): each `#seg:` ref in the
  * manifest LIST carries its segment's per-column min/max ENVELOPE +
  * file count, and the scan planner refutes whole segments from the
  * list alone — a selective scan of an N-segment table resolves (reads,
  * parses, caches) only the segments that can hold a match. This was
  * the last O(files)-on-the-driver planning cost.
  */
class SegmentPruneSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_segprune_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  /** One append per disjoint k-range → one segment per range. */
  private def rangedTable(root: String, ranges: Seq[Range]): Unit = {
    import spark.implicits._
    ranges.zipWithIndex.foreach { case (r, i) =>
      r.map(k => (k.toLong, s"v$k")).toDF("k", "v").coalesce(1)
        .write.format("graft.sources.ManifestSink")
        .mode(if (i == 0) "overwrite" else "append")
        .option("path", root).save()
    }
  }

  test("a selective scan resolves only the envelope-matching segment") {
    val root = freshRoot("selective")
    rangedTable(root, Seq(0 until 100, 100 until 200, 200 until 300, 300 until 400))
    // every ref line carries an envelope
    val refs = LakeTestAccess.rawListLines(Paths.get(root))
      .filter(_.startsWith("#seg:"))
    assert(refs.length == 4)
    assert(refs.forall(_.contains("|")), s"refs missing envelopes: $refs")

    val before = LakeTestAccess.segResolves
    val out = spark.read.schema("k LONG, v STRING")
      .format("graft.sources.ManifestSink").option("path", root).load()
      .filter(col("k") >= 150L && col("k") < 160L)
      .collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(0)).sorted.toSeq == (150L until 160L))
    // build() pruned 3 of 4 segments from the LIST alone
    assert(ManifestRead.lastSegLedger.get() == ((1, 4)),
      s"seg ledger: ${ManifestRead.lastSegLedger.get()}")
    // and the total resolution count stayed O(matching): only the
    // straddling segment resolves (exactness probes + build; a cache
    // miss counts twice), never all four
    val delta = LakeTestAccess.segResolves - before
    assert(delta <= 4L, s"resolved too many segments: $delta")
  }

  test("metadata-only count(*) folds envelopes without resolving any segment") {
    val root = freshRoot("meta_agg")
    rangedTable(root, Seq(0 until 50, 50 until 120, 120 until 200))
    val df = spark.read.schema("k LONG, v STRING")
      .format("graft.sources.ManifestSink").option("path", root).load()
    val before = LakeTestAccess.segResolves
    val n = df.agg(org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("n")).collect().head.getLong(0)
    assert(n == 200L)
    assert(LakeTestAccess.segResolves - before == 0L,
      "count(*) must fold envelopes, not resolve segments")
    // min/max/sum fold exactly from envelopes too
    val row = df.agg(
      org.apache.spark.sql.functions.min(col("k")).as("mn"),
      org.apache.spark.sql.functions.max(col("k")).as("mx"),
      org.apache.spark.sql.functions.sum(col("k")).as("s")).collect().head
    assert(row.getLong(0) == 0L && row.getLong(1) == 199L)
    assert(row.getLong(2) == (0L until 200L).sum)
  }

  test("an exactly-pushed covering filter composes with envelope pruning") {
    val root = freshRoot("exact_env")
    rangedTable(root, Seq(0 until 100, 100 until 200, 200 until 300))
    val df = spark.read.schema("k LONG, v STRING")
      .format("graft.sources.ManifestSink").option("path", root).load()
    val before = LakeTestAccess.segResolves
    // k < 100 covers segment 1 wholly and refutes 2 and 3: the filter
    // pushes EXACTLY and count(*) answers from the envelope fold alone
    val n = df.filter(col("k") < 100L)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n")).collect().head.getLong(0)
    assert(n == 100L)
    assert(LakeTestAccess.segResolves - before == 0L,
      "a fully-decided filter must not resolve any segment")
  }

  test("consolidation re-derives the merged segment's envelope") {
    val root = freshRoot("consolidate")
    val prev = System.getProperty("graft.lake.maxSegRefs")
    System.setProperty("graft.lake.maxSegRefs", "8")
    try {
      rangedTable(root, (0 until 12).map(i => i * 100 until (i + 1) * 100))
      val refs = LakeTestAccess.rawListLines(Paths.get(root))
        .filter(_.startsWith("#seg:"))
      assert(refs.length < 12, s"consolidation must have fired: ${refs.length}")
      assert(refs.forall(_.contains("|")),
        s"merged ref lost its envelope: $refs")
      // a filter inside the MERGED span resolves only the merged segment
      val out = spark.read.schema("k LONG, v STRING")
        .format("graft.sources.ManifestSink").option("path", root).load()
        .filter(col("k") === 50L).collect()
      assert(out.length == 1)
      val (resolved, total) = ManifestRead.lastSegLedger.get()
      assert(total == refs.length && resolved == 1,
        s"ledger ($resolved, $total) vs refs ${refs.length}")
      // full correctness after consolidation
      assert(ManifestSink.readCommitted(spark, root).count() == 1200L)
    } finally {
      if (prev == null) System.clearProperty("graft.lake.maxSegRefs")
      else System.setProperty("graft.lake.maxSegRefs", prev)
    }
  }

  test("envelope-less refs (pre-r17 manifests) degrade to full resolution") {
    val root = freshRoot("legacy")
    rangedTable(root, Seq(0 until 100, 100 until 200))
    // strip the envelopes off the live manifest, simulating a pre-r17 list
    val m = Paths.get(root).resolve("manifest.json")
    val stripped = Files.readAllLines(m).toArray(Array.empty[String]).toSeq
      .map(l => if (l.startsWith("#seg:")) l.takeWhile(_ != '|') else l)
    Files.write(m, stripped.mkString("\n").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    val out = spark.read.schema("k LONG, v STRING")
      .format("graft.sources.ManifestSink").option("path", root).load()
      .filter(col("k") === 150L).collect()
    assert(out.length == 1)
    // both segments resolved (no envelopes to prune on) — but per-FILE
    // stats still skipped the non-matching file
    assert(ManifestRead.lastSegLedger.get() == ((2, 2)))
    assert(ManifestRead.lastSkipLedger.get()._1 == 1)
  }

  test("grouped metadata aggregates fold pure envelopes as units and " +
      "resolve impure ones per-file") {
    import spark.implicits._
    val root = freshRoot("grouped")
    // commit 1: partitioned write, ONE commit holding p=1 and p=2 files
    // (segment envelope IMPURE on p; files pure)
    Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("p", "x")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("partitionBy", "p").save()
    // commit 2: single-partition append (envelope PURE on p)
    Seq((3L, 40L), (3L, 50L)).toDF("p", "x")
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root)
      .option("partitionBy", "p").save()
    val df = spark.read.schema("p LONG, x LONG")
      .format("graft.sources.ManifestSink").option("path", root).load()
    val rows = df.groupBy(col("p"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(col("x")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(rows.toSeq == Seq((1L, 2L, 30L), (2L, 1L, 30L), (3L, 2L, 90L)))
  }
}
