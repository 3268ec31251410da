package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestSink

/** SQL-native row-level DML (VERDICT r16 Next #2): UPDATE and MERGE
  * INTO plan through SupportsRowLevelOperations with the copy-on-write
  * materialization — candidate files prune via stats, runtime group
  * filtering narrows to matched files, and the write replaces exactly
  * the scanned set in one CAS-protected snapshot.
  */
class RowLevelSqlSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    s
  }

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_rlo_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  private def mkTable(tag: String, rows: Seq[(Long, Long, String)],
      parts: Int = 4): String = {
    import spark.implicits._
    val root = freshRoot(tag)
    val name = s"rlo_$tag"
    spark.sql(s"DROP TABLE IF EXISTS graft_cat.lake.$name")
    rows.toDF("k", "x", "v").repartition(parts)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    spark.sql(s"CREATE TABLE graft_cat.lake.$name (k BIGINT, x BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root')")
    name
  }

  test("SQL UPDATE rewrites matching rows and keeps the rest byte-exact") {
    val rows = (0L until 100L).map(i => (i, i * 10L, s"v$i"))
    val name = mkTable("update", rows)
    spark.sql(s"UPDATE graft_cat.lake.$name SET x = x + 1000, v = 'upd' " +
      "WHERE k >= 90")
    val got = spark.sql(s"SELECT k, x, v FROM graft_cat.lake.$name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val want = rows.map { case (k, x, v) =>
      if (k >= 90L) (k, x + 1000L, "upd") else (k, x, v)
    }.sorted
    assert(got.toSeq == want)
  }

  test("SQL MERGE INTO upserts: matched rows update, new keys insert") {
    import spark.implicits._
    val rows = (0L until 50L).map(i => (i, i, s"v$i"))
    val name = mkTable("merge", rows)
    Seq((40L, 777L, "m40"), (45L, 888L, "m45"), (100L, 999L, "new"))
      .toDF("k", "x", "v").createOrReplaceTempView("rlo_merge_src")
    spark.sql(
      s"""MERGE INTO graft_cat.lake.$name t USING rlo_merge_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET t.x = s.x, t.v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, x, v) VALUES (s.k, s.x, s.v)
         |""".stripMargin)
    val got = spark.sql(s"SELECT k, x, v FROM graft_cat.lake.$name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val want = (rows.map { case (k, x, v) =>
      if (k == 40L) (k, 777L, "m40") else if (k == 45L) (k, 888L, "m45")
      else (k, x, v)
    } :+ ((100L, 999L, "new"))).sorted
    assert(got.toSeq == want)
  }

  test("a selective UPDATE replaces only candidate files; the rest carry by name") {
    import spark.implicits._
    val root = freshRoot("pruned")
    val name = "rlo_pruned"
    spark.sql(s"DROP TABLE IF EXISTS graft_cat.lake.$name")
    // 4 disjoint-range files via 4 appends (4 segments, 4 files)
    (0 until 4).foreach { i =>
      (i * 100 until (i + 1) * 100).map(k => (k.toLong, k.toLong, s"v$k"))
        .toDF("k", "x", "v").coalesce(1)
        .write.format("graft.sources.ManifestSink")
        .mode(if (i == 0) "overwrite" else "append")
        .option("path", root).save()
    }
    spark.sql(s"CREATE TABLE graft_cat.lake.$name (k BIGINT, x BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root')")
    val before = ManifestSink.committedFiles(root)
      .map(f => Paths.get(f).getFileName.toString).toSet
    spark.sql(s"UPDATE graft_cat.lake.$name SET x = -1 WHERE k >= 150 AND k < 160")
    val after = ManifestSink.committedFiles(root)
      .map(f => Paths.get(f).getFileName.toString).toSet
    // exactly one candidate file replaced: 3 of 4 originals carry
    assert((before intersect after).size == 3,
      s"untouched files must carry by name: before=$before after=$after")
    val got = spark.sql(s"SELECT k, x FROM graft_cat.lake.$name")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = (0L until 400L).map(k =>
      (k, if (k >= 150L && k < 160L) -1L else k)).sorted
    assert(got.toSeq == want)
  }

  test("MERGE preserves a partitioned parquet table's layout claims") {
    import spark.implicits._
    val root = freshRoot("layout")
    val name = "rlo_layout"
    spark.sql(s"DROP TABLE IF EXISTS graft_cat.lake.$name")
    (0L until 300L).map(i => (i % 3L, i, s"v$i")).toDF("p", "k", "v")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet")
      .option("partitionBy", "p").option("orderBy", "k").save()
    spark.sql(s"CREATE TABLE graft_cat.lake.$name (p BIGINT, k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root', format 'parquet', " +
      "partitionBy 'p', orderBy 'k')")
    Seq((1L, 10L, "upd"), (2L, 9999L, "ins")).toDF("p", "k", "v")
      .createOrReplaceTempView("rlo_layout_src")
    spark.sql(
      s"""MERGE INTO graft_cat.lake.$name t USING rlo_layout_src s
         |ON t.p = s.p AND t.k = s.k
         |WHEN MATCHED THEN UPDATE SET t.v = s.v
         |WHEN NOT MATCHED THEN INSERT (p, k, v) VALUES (s.p, s.k, s.v)
         |""".stripMargin)
    // every committed file is still parquet, partition-pure on p, and
    // sorted by k (the layout-preserving rewrite contract)
    val names = ManifestSink.committedFiles(root)
      .map(f => Paths.get(f).getFileName.toString)
    assert(names.forall(_.endsWith(".parquet")), s"format demoted: $names")
    val stats = ManifestSink.fileStats(root)
    assert(names.forall(n => stats.get(n).exists(fs =>
      fs.cols.get("p").exists(c => c.nulls == 0L && c.min == c.max))),
      "partition purity lost in the rewrite")
    assert(names.forall(n => stats.get(n).exists(_.sorted.startsWith(Seq("p")))),
      "sort claim lost in the rewrite")
    // and the rows are right
    val got = spark.sql(s"SELECT p, k, v FROM graft_cat.lake.$name " +
      "WHERE k = 10 OR k = 9999").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(got.toSeq == Seq((1L, 10L, "upd"), (2L, 9999L, "ins")))
    assert(spark.sql(s"SELECT count(*) FROM graft_cat.lake.$name")
      .collect().head.getLong(0) == 301L)
  }

  test("SQL DELETE still routes through the metadata path (deleteWhere)") {
    val rows = (0L until 30L).map(i => (i, i, s"v$i"))
    val name = mkTable("delete", rows)
    val gensBefore = ManifestSink.snapshots(s"/tmp/graft_rlo_spec_delete").length
    spark.sql(s"DELETE FROM graft_cat.lake.$name WHERE k < 10")
    assert(spark.sql(s"SELECT k FROM graft_cat.lake.$name")
      .collect().map(_.getLong(0)).toSet == (10L until 30L).toSet)
    assert(ManifestSink.snapshots(s"/tmp/graft_rlo_spec_delete").length ==
      gensBefore + 1)
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE deletes unreferenced rows, " +
      "CoW and MoR alike") {
    import spark.implicits._
    for (mode <- Seq("cow", "mor")) {
      val root = freshRoot(s"nbs_$mode")
      val name = s"rlo_nbs_$mode"
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
        .coalesce(2).write.format("graft.sources.ManifestSink")
        .mode("overwrite").option("path", root)
        .option("format", "parquet").save()
      spark.sql(s"DROP TABLE IF EXISTS graft_cat.lake.$name")
      spark.sql(s"CREATE TABLE graft_cat.lake.$name (k BIGINT, v STRING) " +
        s"USING graft OPTIONS (path '$root', format 'parquet', " +
        s"deleteMode '$mode')")
      Seq((2L, "B"), (9L, "I")).toDF("k", "v")
        .createOrReplaceTempView(s"nbs_src_$mode")
      spark.sql(
        s"""MERGE INTO graft_cat.lake.$name t USING nbs_src_$mode s
           |ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET t.v = s.v
           |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
           |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      val got = spark.sql(s"SELECT k, v FROM graft_cat.lake.$name ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((2L, "B"), (9L, "I")),
        s"mode=$mode got $got")
    }
  }
}
