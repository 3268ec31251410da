package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ManifestRead, ManifestSink}

/** Data-reclustering rewrite (VERDICT r17 Next #2): the Iceberg
  * `rewrite_data_files(sort_order => ...)` shape as
  * `CALL graft_cat.system.rewrite(table, order_by|zorder, target_files)`.
  * Pinned here:
  *   - order_by: content unchanged, files carry the sort claim with
  *     DISJOINT envelopes (a point query reads 1 of N files), and the
  *     scan's reported ordering is consumed — a downstream per-partition
  *     sort on the key plans sort-free (RemoveRedundantSorts);
  *   - zorder: selective predicates on EITHER curve dimension prune
  *     files that a key-sorted layout can only prune on its own key;
  *   - MoR deletes fold through the rewrite; re-running an already
  *     satisfied order_by rewrite is a no-op (idempotent retry);
  *   - partitioned tables and malformed argument sets refuse loudly.
  */
class RewriteProcedureSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    s
  }

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_rewrite_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  /** 300 rows over k = 0..299 written as 3 UNSORTED slices (k % 3), so
    * every file's k-envelope spans the whole domain — nothing prunes
    * before the rewrite.
    */
  private def build(name: String, tag: String, extra: String = ""): String = {
    import spark.implicits._
    val root = freshRoot(tag)
    (0 until 3).foreach { m =>
      (0 until 300).filter(_ % 3 == m)
        .map(k => (k.toLong, (k * 37 % 100).toLong, s"v$k"))
        .toDF("k", "y", "v")
        .coalesce(1).write.format("graft.sources.ManifestSink")
        .mode(if (m == 0) "overwrite" else "append")
        .option("path", root).option("format", "parquet").save()
    }
    spark.sql(s"DROP TABLE IF EXISTS graft_cat.lake.$name")
    spark.sql(s"CREATE TABLE graft_cat.lake.$name (k BIGINT, y BIGINT, " +
      s"v STRING) USING graft OPTIONS (path '$root', format 'parquet'$extra)")
    root
  }

  test("order_by rewrite: disjoint sorted files, point query reads 1 of 4") {
    val root = build("rw_sort", "sort")
    // pre-rewrite: every file overlaps k=150
    spark.sql("SELECT * FROM graft_cat.lake.rw_sort WHERE k = 150").collect()
    val (kept0, total0) = ManifestRead.lastSkipLedger.get()
    assert(total0 == 3 && kept0 == 3, s"unsorted slices must all overlap " +
      s"(kept=$kept0 total=$total0)")
    val row = spark.sql("CALL graft_cat.system.rewrite(table => 'rw_sort', " +
      "order_by => 'k', target_files => 4)").head
    assert(row.getLong(0) == 3L && row.getLong(1) == 4L)
    assert(row.getString(3) == "order:k")
    // content unchanged
    assert(spark.sql("SELECT * FROM graft_cat.lake.rw_sort").count() == 300L)
    assert(spark.sql("SELECT sum(k) FROM graft_cat.lake.rw_sort")
      .head.getLong(0) == (0L until 300L).sum)
    // every file claims the sort and the envelopes are disjoint
    val stats = ManifestSink.fileStats(root)
    val names = ManifestSink.committedFiles(root)
      .map(f => Paths.get(f).getFileName.toString)
    assert(names.size == 4)
    assert(names.forall(n => stats(n).sorted.startsWith(Seq("k"))))
    val ranges = names.map { n =>
      val c = stats(n).cols("k")
      (c.min.get.asInstanceOf[Long], c.max.get.asInstanceOf[Long])
    }.sortBy(_._1)
    assert(ranges.sliding(2).forall {
      case Seq((_, aMax), (bMin, _)) => aMax < bMin
      case _ => true
    }, s"overlapping post-rewrite envelopes: $ranges")
    // point query now reads exactly one file
    val out = spark.sql("SELECT v FROM graft_cat.lake.rw_sort WHERE k = 150")
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("v150"))
    val (kept1, total1) = ManifestRead.lastSkipLedger.get()
    assert(total1 == 4 && kept1 == 1,
      s"point query must prune to 1 file (kept=$kept1 total=$total1)")
    // idempotent retry: already satisfied -> no new snapshot
    val genBefore = ManifestSink.snapshots(root).last
    spark.sql("CALL graft_cat.system.rewrite(table => 'rw_sort', " +
      "order_by => 'k', target_files => 4)").collect()
    assert(ManifestSink.snapshots(root).last == genBefore,
      "a satisfied rewrite must no-op")
  }

  test("the rewrite's sort claim is consumed: a per-partition re-sort " +
      "plans sort-free (RemoveRedundantSorts)") {
    // A DSv2 scan can never claim SinglePartition (only
    // keyGroupedPartitioning is special-cased in BatchScanExec), so a
    // GLOBAL window stays exchange-gated; what the reported ordering
    // DOES buy is every downstream per-partition sort on the same key —
    // e.g. re-exporting the sorted table into another sorted sink pays
    // no SortExec.
    // openCostBytes sized so the two small files stay singleton bins:
    // the per-partition ordering claim honestly drops on PACKED bins
    // (concatenated sorted files are not sorted), and at 100 TB sorted
    // files meet the split target on their own
    build("rw_win", "win", extra = ", openCostBytes '134217728'")
    spark.sql("CALL graft_cat.system.rewrite(table => 'rw_win', " +
      "order_by => 'k', target_files => 2)").collect()
    val sorted = spark.table("graft_cat.lake.rw_win")
      .sortWithinPartitions("k")
    val plan = sorted.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort "), s"redundant sort survived:\n$plan")
    assert(!plan.contains("Exchange"), s"spurious exchange:\n$plan")
    assert(sorted.count() == 300L)
    // the same shape over the UNSORTED twin pays the sort — the claim,
    // not the data, is what the planner consumed
    build("rw_win_raw", "win_raw", extra = ", openCostBytes '134217728'")
    val raw = spark.table("graft_cat.lake.rw_win_raw")
      .sortWithinPartitions("k")
    assert(raw.queryExecution.executedPlan.toString.contains("Sort "),
      "control: unsorted table must plan the sort")
  }

  test("zorder rewrite: selective predicates on either dimension prune") {
    val root = build("rw_z", "zorder")
    val row = spark.sql("CALL graft_cat.system.rewrite(table => 'rw_z', " +
      "zorder => 'k,y', target_files => 4)").head
    assert(row.getString(3) == "zorder:k,y")
    assert(ManifestSink.committedFiles(root).size == 4)
    // content unchanged
    assert(spark.sql("SELECT sum(k + y) FROM graft_cat.lake.rw_z")
      .head.getLong(0) ==
      (0 until 300).map(k => k.toLong + (k * 37 % 100)).sum)
    // a box query is exact
    val box = spark.sql("SELECT k FROM graft_cat.lake.rw_z " +
      "WHERE k BETWEEN 0 AND 70 AND y BETWEEN 0 AND 40")
      .collect().map(_.getLong(0)).toSet
    val expect = (0 until 300)
      .filter(k => k <= 70 && (k * 37 % 100) <= 40).map(_.toLong).toSet
    assert(box == expect)
    // each dimension alone prunes: the z-cells bound BOTH ranges, where
    // the unsorted layout (and a k-only sort, for y) prunes neither
    spark.sql("SELECT k FROM graft_cat.lake.rw_z WHERE k < 64").collect()
    val (keptK, totalK) = ManifestRead.lastSkipLedger.get()
    assert(totalK == 4 && keptK < 4,
      s"selective k predicate must skip z-files (kept=$keptK)")
    spark.sql("SELECT k FROM graft_cat.lake.rw_z WHERE y < 20").collect()
    val (keptY, totalY) = ManifestRead.lastSkipLedger.get()
    assert(totalY == 4 && keptY < 4,
      s"selective y predicate must skip z-files (kept=$keptY)")
  }

  test("MoR tombstones fold through the rewrite; guards refuse loudly") {
    val root = build("rw_mor", "mor", extra = ", deleteMode 'mor'")
    spark.sql("DELETE FROM graft_cat.lake.rw_mor WHERE k >= 200")
    assert(ManifestSink.fileStats(root).nonEmpty)
    spark.sql("CALL graft_cat.system.rewrite(table => 'rw_mor', " +
      "order_by => 'k', target_files => 2)").collect()
    // the tombstone drained into clean files
    assert(spark.sql("SELECT * FROM graft_cat.lake.`rw_mor$deletes`")
      .count() == 0L)
    assert(spark.sql("SELECT count(*), max(k) FROM graft_cat.lake.rw_mor")
      .head.toSeq == Seq(200L, 199L))
    // argument guards
    assert(intercept[Exception](spark.sql(
      "CALL graft_cat.system.rewrite(table => 'rw_mor')").collect())
      .getMessage.contains("exactly one of"))
    assert(intercept[Exception](spark.sql(
      "CALL graft_cat.system.rewrite(table => 'rw_mor', order_by => 'k', " +
        "zorder => 'k,y')").collect())
      .getMessage.contains("exactly one of"))
    assert(intercept[Exception](spark.sql(
      "CALL graft_cat.system.rewrite(table => 'rw_mor', zorder => 'k')")
      .collect()).getMessage.contains("2-3"))
    assert(intercept[Exception](spark.sql(
      "CALL graft_cat.system.rewrite(table => 'rw_mor', zorder => 'k,v')")
      .collect()).getMessage.contains("integral"))
    // a partitioned table routes to the PARTIAL-PROGRESS path (r19):
    // per-partition sort, one batch here (4 groups < default 8/commit)
    import spark.implicits._
    val proot = freshRoot("part")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.rw_part")
    spark.sql(s"CREATE TABLE graft_cat.lake.rw_part (k BIGINT, b BIGINT) " +
      s"USING graft PARTITIONED BY (b) OPTIONS (path '$proot', " +
      "format 'parquet')")
    (0 until 40).map(k => (k.toLong, k.toLong % 4)).toDF("k", "b")
      .writeTo("graft_cat.lake.rw_part").append()
    // the DIRECT API refuses while the files carry the declared-layout
    // purity claims (ADVICE r18) — checked BEFORE the partial rewrite,
    // whose own files claim only the order key; the escape hatch
    // documents intent explicitly (code-review r19)
    assert(intercept[Exception](
      ManifestSink.rewrite(spark, proot, orderBy = Seq("k")))
      .getMessage.contains("partition-pure"))
    assert(intercept[Exception](
      ManifestSink.rewrite(spark, proot, orderBy = Seq("k")))
      .getMessage.contains("allowClaimDemotion"))
    val prow = spark.sql(
      "CALL graft_cat.system.rewrite(table => 'rw_part', order_by => 'k')")
      .head
    assert(prow.getString(3).startsWith("order-in-partitions:k"),
      s"unexpected label: ${prow.getString(3)}")
    assert(prow.getLong(4) == 1L, s"4 groups fit one batch: $prow")
    // where => scoping refuses on unpartitioned tables
    assert(intercept[Exception](spark.sql(
      "CALL graft_cat.system.rewrite(table => 'rw_mor', order_by => 'k', " +
        "where => 'k = 3')").collect())
      .getMessage.contains("partitioned tables only"))
  }
}
