package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestSink

/** SQL stored procedures (r17): `CALL graft_cat.system.<proc>(...)`
  * through Spark 4's ProcedureCatalog — compact, vacuum and snapshots
  * run the same CAS-protected engine helpers as the Scala surface and
  * return driver-local summary rows.
  */
class ProcedureSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    s
  }

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_proc_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  private def build(name: String, tag: String, parts: Int = 3): String = {
    import spark.implicits._
    val root = freshRoot(tag)
    (0 until parts).foreach { i =>
      (i * 10 until (i + 1) * 10).map(k => (k.toLong, s"v$k")).toDF("k", "v")
        .coalesce(1).write.format("graft.sources.ManifestSink")
        .mode(if (i == 0) "overwrite" else "append")
        .option("path", root).option("format", "parquet").save()
    }
    spark.sql(s"DROP TABLE IF EXISTS graft_cat.lake.$name")
    spark.sql(s"CREATE TABLE graft_cat.lake.$name (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root', format 'parquet')")
    root
  }

  test("CALL system.compact merges files and reports the counts") {
    val root = build("proc_cmp", "cmp")
    val row = spark.sql(
      "CALL graft_cat.system.compact(table => 'proc_cmp', target_files => 1)")
      .head
    assert(row.getLong(0) == 3L && row.getLong(1) == 1L)
    assert(row.getLong(2) == ManifestSink.snapshots(root).last)
    assert(ManifestSink.committedFiles(root).length == 1)
    assert(spark.sql("SELECT count(*) FROM graft_cat.lake.proc_cmp")
      .head.getLong(0) == 30L)
    // positional args work too; an already-compact table no-ops
    val again = spark.sql("CALL graft_cat.system.compact('proc_cmp')").head
    assert(again.getLong(0) == 1L && again.getLong(1) == 1L)
  }

  test("CALL system.vacuum expires history and reports deletions") {
    val root = build("proc_vac", "vac")
    spark.sql("CALL graft_cat.system.compact(table => 'proc_vac')")
    val deleted = spark.sql(
      "CALL graft_cat.system.vacuum(table => 'proc_vac', retain_snapshots => 1)")
      .head.getLong(0)
    // the three pre-compaction files orphan once only the live state is retained
    assert(deleted == 3L)
    assert(spark.sql("SELECT count(*) FROM graft_cat.lake.proc_vac")
      .head.getLong(0) == 30L)
  }

  test("CALL system.snapshots lists the retained history in order") {
    val root = build("proc_snap", "snap")
    val rows = spark.sql("CALL graft_cat.system.snapshots(table => 'proc_snap')")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == ManifestSink.snapshots(root))
    // commit instants are strictly increasing (the TIMESTAMP AS OF ledger)
    val ts = rows.map(_.getLong(1)).toSeq
    assert(ts == ts.sorted && ts.distinct.length == ts.length)
  }

  test("qualified and differently-cased table references resolve (ADVICE r18)") {
    val root = build("proc_qual", "qual")
    // catalog-qualified, namespace-qualified and upper-cased references
    // all name the same table — resolution lowercases and strips the
    // optional '<catalog>.' / 'lake.' prefixes before lookup
    Seq("proc_qual", "lake.proc_qual", "graft_cat.lake.proc_qual",
        "LAKE.proc_qual", "GRAFT_CAT.LAKE.PROC_QUAL").foreach { ref =>
      val rows = spark.sql(
        s"CALL graft_cat.system.snapshots(table => '$ref')").collect()
      assert(rows.map(_.getLong(0)).toSeq == ManifestSink.snapshots(root),
        s"reference '$ref' failed to resolve")
    }
  }

  test("unknown procedures and tables refuse loudly; SHOW PROCEDURES lists") {
    build("proc_err", "err")
    // Spark wraps loadProcedure failures as FAILED_TO_LOAD_ROUTINE
    assert(intercept[Exception](spark.sql(
      "CALL graft_cat.system.nope('proc_err')").collect())
      .getMessage.contains("Failed to load routine"))
    assert(intercept[Exception](spark.sql(
      "CALL graft_cat.system.compact(table => 'no_such_table')").collect())
      .getMessage.contains("unknown lake table"))
    val listed = spark.sql("SHOW PROCEDURES IN graft_cat.system").collect()
      .map(_.toString).mkString(",")
    assert(listed.contains("compact") && listed.contains("vacuum") &&
      listed.contains("snapshots"))
  }
}
