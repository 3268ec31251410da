package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** SNAPSHOT BRANCHES (r19 — the write-audit-publish half of VERDICT
  * r18 Next #4). A branch is a mutable named ref in `_refs.json`:
  * branch commits publish real `#br:`-marked snapshots in the global
  * numbering WITHOUT moving `manifest.json`, and `fast_forward`
  * republishes the audited head onto main metadata-only. Pinned here:
  *   - the full WAP cycle: branch → `.option("branch", ...)` append →
  *     main unchanged → `VERSION AS OF 'branch'` audits → fast_forward
  *     → main adopts the branch state, repeatably;
  *   - fast-forward REFUSES when main diverged from the fork base;
  *   - main-lineage isolation: TIMESTAMP AS OF and the CDC feed never
  *     see branch commits; main DML CAS is not poisoned by interleaved
  *     branch generations;
  *   - vacuum anchors branch heads (and main's live head) while
  *     expiring dropped branches' snapshots;
  *   - the branch-head CAS refuses a stale publish; misuse (all-digit
  *     names, tag/branch name collisions, writes to unknown branches,
  *     streaming into a branch) refuses loudly.
  */
class BranchesSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    s
  }

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_branches_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  /** 100-row base table registered in the catalog; returns its root. */
  private def build(name: String, tag: String): String = {
    import spark.implicits._
    val root = freshRoot(tag)
    (0 until 100).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet").save()
    spark.sql(s"DROP TABLE IF EXISTS graft_cat.lake.$name")
    spark.sql(s"CREATE TABLE graft_cat.lake.$name (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root', format 'parquet')")
    root
  }

  private def slice(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(k => (k.toLong, s"v$k")).toDF("k", "v").coalesce(1)
  }

  test("write-audit-publish: branch writes are invisible to main until " +
      "fast_forward adopts them, and the cycle composes") {
    val root = build("br_wap", "wap")
    spark.sql("CALL graft_cat.system.branch(table => 'br_wap', name => 'audit')")

    // two staged appends to the branch
    slice(100, 150).writeTo("graft_cat.lake.br_wap")
      .option("branch", "audit").append()
    slice(150, 200).writeTo("graft_cat.lake.br_wap")
      .option("branch", "audit").append()

    // main is untouched; the branch read audits the staged state
    assert(spark.table("graft_cat.lake.br_wap").count() === 100L)
    assert(spark.sql(
      "SELECT * FROM graft_cat.lake.br_wap VERSION AS OF 'audit'")
      .count() === 200L)
    // audit checks can be arbitrary SQL over the branch read
    assert(spark.sql(
      """SELECT count(*) FROM graft_cat.lake.br_wap VERSION AS OF 'audit'
        |WHERE v <> concat('v', CAST(k AS STRING))""".stripMargin)
      .head().getLong(0) === 0L)

    // publish: metadata-only fast-forward; main adopts the branch state
    val gen = spark.sql(
      "CALL graft_cat.system.fast_forward(table => 'br_wap', " +
        "branch => 'audit')").head().getLong(0)
    assert(spark.table("graft_cat.lake.br_wap").count() === 200L)
    assert(ManifestSink.liveGen(root) === gen)

    // the CDC feed sees the publish as ONE insert delta on main: the
    // 100 staged rows arrive at the fast-forward generation, never at
    // their branch commits
    val feed = ManifestChanges.readChanges(spark, root, 0L, gen)
    assert(feed.count() === 200L)
    assert(feed.where(s"_commit_gen = $gen").count() === 100L)

    // the cycle composes: keep writing to the same branch, publish again
    slice(200, 220).writeTo("graft_cat.lake.br_wap")
      .option("branch", "audit").append()
    assert(spark.table("graft_cat.lake.br_wap").count() === 200L)
    spark.sql("CALL graft_cat.system.fast_forward(table => 'br_wap', " +
      "branch => 'audit')")
    assert(spark.table("graft_cat.lake.br_wap").count() === 220L)
    // a no-op fast-forward (nothing new on the branch) is a no-op
    val before = ManifestSink.liveGen(root)
    spark.sql("CALL graft_cat.system.fast_forward(table => 'br_wap', " +
      "branch => 'audit')")
    assert(ManifestSink.liveGen(root) === before)
  }

  test("fast_forward refuses when main diverged from the fork base") {
    val root = build("br_div", "div")
    spark.sql("CALL graft_cat.system.branch(table => 'br_div', name => 'wip')")
    slice(100, 120).writeTo("graft_cat.lake.br_div")
      .option("branch", "wip").append()
    // main moves underneath the branch
    slice(500, 510).writeTo("graft_cat.lake.br_div").append()
    val e = intercept[Exception] {
      spark.sql("CALL graft_cat.system.fast_forward(table => 'br_div', " +
        "branch => 'wip')").collect()
    }
    assert(e.getMessage.contains("diverged"), e.getMessage)
    // main kept its own commit; the branch still audits independently
    assert(spark.table("graft_cat.lake.br_div").count() === 110L)
    assert(spark.sql(
      "SELECT * FROM graft_cat.lake.br_div VERSION AS OF 'wip'")
      .count() === 120L)
    assert(ManifestSink.dropBranch(root, "wip"))
  }

  test("main-lineage isolation: TIMESTAMP AS OF, the CDC feed, and main " +
      "DML never observe branch commits") {
    val root = build("br_iso", "iso")
    spark.sql("CALL graft_cat.system.branch(table => 'br_iso', name => 'b')")
    slice(100, 130).writeTo("graft_cat.lake.br_iso")
      .option("branch", "b").append()

    // the branch generation exists globally but is not main history
    val all = ManifestSink.snapshots(root)
    val main = ManifestSink.mainSnapshots(root)
    assert(all.size === main.size + 1)
    assert(ManifestSink.snapshotTimestamps(root).map(_._1) === main)

    // a timestamp far AFTER the branch commit still resolves to main's
    // head — never to the (newer) branch generation
    assert(spark.sql(
      "SELECT * FROM graft_cat.lake.br_iso " +
        "TIMESTAMP AS OF '2035-01-01 00:00:00'").count() === 100L)

    // the CDC feed replays ONLY main lineage: a main append lands in
    // the feed, the 30 branch rows never do
    slice(1000, 1010).writeTo("graft_cat.lake.br_iso").append()
    val top1 = ManifestSink.liveGen(root)
    val feed1 = ManifestChanges.readChanges(spark, root, 0L, top1)
    assert(feed1.count() === 110L)
    assert(feed1.where("_change_type = 'insert'").count() === 110L)

    // main DML proceeds: its CAS base is main's head, not the global
    // max — an interleaved branch generation must not poison it
    spark.sql("DELETE FROM graft_cat.lake.br_iso WHERE k < 10")
    assert(spark.table("graft_cat.lake.br_iso").count() === 100L)

    // main moved, so the WAP contract refuses the publish
    val e = intercept[Exception] {
      spark.sql("CALL graft_cat.system.fast_forward(table => 'br_iso', " +
        "branch => 'b')").collect()
    }
    assert(e.getMessage.contains("diverged"), e.getMessage)
  }

  test("vacuum anchors branch heads and main's live head; drop_branch " +
      "releases the branch's snapshots") {
    val root = build("br_vac", "vac")
    spark.sql("CALL graft_cat.system.branch(table => 'br_vac', name => 'keep')")
    slice(100, 140).writeTo("graft_cat.lake.br_vac")
      .option("branch", "keep").append()
    val head = ManifestSink.branchHead(root, "keep")
    // churn main so the retention window fills with main commits
    slice(1000, 1010).writeTo("graft_cat.lake.br_vac").append()
    slice(1010, 1020).writeTo("graft_cat.lake.br_vac").append()
    ManifestSink.vacuum(root, retainSnapshots = 1)
    // the branch head survived retention-1 WITH its data files
    assert(ManifestSink.snapshots(root).contains(head))
    assert(spark.sql(
      "SELECT * FROM graft_cat.lake.br_vac VERSION AS OF 'keep'")
      .count() === 140L)
    // main's live head always survives too
    assert(ManifestSink.snapshots(root).contains(ManifestSink.liveGen(root)))
    // dropping the branch releases its snapshots to the next vacuum
    assert(ManifestSink.dropBranch(root, "keep"))
    ManifestSink.vacuum(root, retainSnapshots = 1)
    assert(!ManifestSink.snapshots(root).contains(head))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_cat.lake.br_vac VERSION AS OF 'keep'")
        .collect()
    }
    assert(e.getMessage.contains("VERSION AS OF"), e.getMessage)
  }

  test("branch-head CAS refuses a stale publish; misuse refuses loudly") {
    val root = build("br_cas", "cas")
    ManifestSink.createBranch(root, "b1")
    // stale expectedHead → ConcurrentModificationException (the race a
    // second writer would hit between its plan and its publish)
    val ddl = "k BIGINT, v STRING"
    intercept[java.util.ConcurrentModificationException] {
      ManifestSink.publishBranch(Paths.get(root), "b1",
        Seq(ddl), expectedHead = 999L)
    }
    // misuse surface
    intercept[IllegalArgumentException] {
      ManifestSink.createBranch(root, "123")
    }
    spark.sql("CALL graft_cat.system.tag(table => 'br_cas', name => 'cut')")
    val eDup = intercept[Exception] {
      spark.sql("CALL graft_cat.system.branch(table => 'br_cas', " +
        "name => 'cut')").collect()
    }
    assert(eDup.getMessage.contains("ambiguous"), eDup.getMessage)
    val eUnknown = intercept[Exception] {
      slice(0, 1).writeTo("graft_cat.lake.br_cas")
        .option("branch", "nope").append()
    }
    assert(eUnknown.getMessage.contains("no branch named"), eUnknown.getMessage)
    // $refs lists both kinds; branches procedure reports head+base
    val refs = spark.sql("SELECT name, kind FROM graft_cat.lake.`br_cas$refs`")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(refs === Set(("b1", "branch"), ("cut", "tag")))
    val br = spark.sql("CALL graft_cat.system.branches(table => 'br_cas')")
      .collect()
    assert(br.length === 1 && br.head.getString(0) === "b1")
    assert(br.head.getLong(1) === br.head.getLong(2)) // unadvanced: head==base
  }

  test("lineage guards: a branch snapshot can be neither tagged nor " +
      "branched from, and an out-of-band-deleted head refuses loudly") {
    val root = build("br_guard", "guard")
    spark.sql("CALL graft_cat.system.branch(table => 'br_guard', name => 'b')")
    slice(100, 110).writeTo("graft_cat.lake.br_guard")
      .option("branch", "b").append()
    val head = ManifestSink.branchHead(root, "b")
    // tagging a branch commit would make VERSION AS OF '<tag>' read
    // unpublished state as table history
    val eTag = intercept[IllegalArgumentException] {
      ManifestSink.tag(root, "cut", Some(head))
    }
    assert(eTag.getMessage.contains("BRANCH commit"), eTag.getMessage)
    // forking a branch from another branch's commit records a base that
    // is not main lineage — fast_forward could only ever misreport
    val eBr = intercept[IllegalArgumentException] {
      ManifestSink.createBranch(root, "b2", Some(head))
    }
    assert(eBr.getMessage.contains("BRANCH commit"), eBr.getMessage)
    // an out-of-band deletion of the anchored head must refuse the next
    // branch commit, never silently truncate the branch
    Files.delete(Paths.get(root).resolve("_snapshots")
      .resolve(s"manifest-$head.json"))
    val eGone = intercept[Exception] {
      slice(110, 120).writeTo("graft_cat.lake.br_guard")
        .option("branch", "b").append()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: causes(t.getCause)
    assert(causes(eGone).exists(m => m != null && m.contains("out-of-band")),
      causes(eGone).mkString(" | "))
  }
}
