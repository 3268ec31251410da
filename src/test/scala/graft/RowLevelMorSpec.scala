package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestSink

/** Delta-based (merge-on-read) SQL row-level DML: UPDATE / MERGE INTO
  * on a `deleteMode 'mor'` table publish position-delete files +
  * appended inserts in ONE snapshot — ZERO existing data files
  * rewrite. The Iceberg v2 positional-delete shape.
  */
class RowLevelMorSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    s
  }

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_rlomor_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  private def dataNames(root: String): Set[String] =
    ManifestSink.committedFiles(root)
      .map(f => Paths.get(f).getFileName.toString).toSet

  private def mkMorTable(tag: String, n: Long = 100L): (String, String) = {
    import spark.implicits._
    val root = freshRoot(tag)
    val name = s"rlomor_$tag"
    spark.sql(s"DROP TABLE IF EXISTS graft_cat.lake.$name")
    (0L until n).map(i => (i, i * 10L, s"v$i")).toDF("k", "x", "v")
      .repartition(4)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet").save()
    spark.sql(s"CREATE TABLE graft_cat.lake.$name (k BIGINT, x BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root', format 'parquet', deleteMode 'mor')")
    (root, name)
  }

  test("MoR UPDATE writes ZERO replacement data files: deletes are positional") {
    val (root, name) = mkMorTable("update")
    val before = dataNames(root)
    spark.sql(s"UPDATE graft_cat.lake.$name SET x = -1, v = 'upd' WHERE k % 7 = 0")
    val after = dataNames(root)
    // every pre-update data file carries by name — nothing rewrote
    assert(before.subsetOf(after),
      s"MoR update must not rewrite data files: lost ${before -- after}")
    // the additions are insert files only (delete files never list as data)
    assert((after -- before).nonEmpty)
    // a #pd: line + delete file exist
    val lines = Files.readAllLines(Paths.get(root, "manifest.json"))
      .toArray(Array.empty[String]).toSeq
    assert(lines.exists(_.startsWith("#pd:")), s"missing #pd: line: $lines")
    // and the rows are exactly the algebraic update
    val got = spark.sql(s"SELECT k, x, v FROM graft_cat.lake.$name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val want = (0L until 100L).map(i =>
      if (i % 7L == 0L) (i, -1L, "upd") else (i, i * 10L, s"v$i")).sorted
    assert(got.toSeq == want)
  }

  test("MoR MERGE upserts atomically; repeated deltas compose; compaction folds") {
    import spark.implicits._
    val (root, name) = mkMorTable("merge")
    val before = dataNames(root)
    Seq((10L, 777L, "m10"), (200L, 999L, "new"))
      .toDF("k", "x", "v").createOrReplaceTempView("rlomor_src")
    spark.sql(
      s"""MERGE INTO graft_cat.lake.$name t USING rlomor_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET t.x = s.x, t.v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, x, v) VALUES (s.k, s.x, s.v)
         |""".stripMargin)
    assert(before.subsetOf(dataNames(root)), "MERGE must not rewrite data files")
    def expect1 = ((0L until 100L).map(i =>
      if (i == 10L) (i, 777L, "m10") else (i, i * 10L, s"v$i")) :+
      ((200L, 999L, "new"))).sorted
    def read() = spark.sql(s"SELECT k, x, v FROM graft_cat.lake.$name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(read() == expect1)
    // a SECOND delta over the first (hits both an original file and the
    // first delta's insert file)
    spark.sql(s"UPDATE graft_cat.lake.$name SET v = 'again' WHERE k IN (10, 200)")
    val expect2 = expect1.map { case (k, x, v) =>
      if (k == 10L || k == 200L) (k, x, "again") else (k, x, v) }
    assert(read() == expect2)
    // snapshot time travel: the pre-merge generation still reads clean
    val gens = ManifestSink.snapshots(root)
    assert(ManifestSink.readSnapshot(spark, root, gens.head).count() == 100L)
    // compaction folds position deletes into clean files and the
    // row-set is unchanged
    ManifestSink.compact(spark, root)
    assert(read() == expect2)
    val lines = Files.readAllLines(Paths.get(root, "manifest.json"))
      .toArray(Array.empty[String]).toSeq
    assert(!lines.exists(_.startsWith("#pd:")), "compaction must fold #pd:")
    // vacuum reclaims the orphaned delete files; reads stay exact
    ManifestSink.vacuum(root)
    assert(read() == expect2)
  }

  test("a MoR delta on a non-parquet table is refused loudly") {
    import spark.implicits._
    val root = freshRoot("refuse")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.rlomor_refuse")
    Seq((1L, 1L, "a")).toDF("k", "x", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save() // JSON payload
    spark.sql("CREATE TABLE graft_cat.lake.rlomor_refuse " +
      "(k BIGINT, x BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root', deleteMode 'mor')")
    val err = intercept[Exception] {
      spark.sql("UPDATE graft_cat.lake.rlomor_refuse SET v = 'x' WHERE k = 1")
    }
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
    assert(rootCause(err).getMessage.contains("parquet payload"),
      s"got: ${rootCause(err)}")
  }

  test("metadata fast paths refuse while position deletes stand; counts stay exact") {
    val (root, name) = mkMorTable("meta")
    spark.sql(s"UPDATE graft_cat.lake.$name SET v = 'u' WHERE k < 5")
    // row answer exact despite stats overcounting deleted rows
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_cat.lake.$name")
      .collect().head.getLong(0) == 100L)
    // vacuum must NOT reclaim the referenced delete file
    ManifestSink.vacuum(root)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_cat.lake.$name")
      .collect().head.getLong(0) == 100L)
    assert(spark.sql(
      s"SELECT sum(x) AS s FROM graft_cat.lake.$name WHERE v = 'u'")
      .collect().head.getLong(0) == (0L until 5L).map(_ * 10L).sum)
  }
}
