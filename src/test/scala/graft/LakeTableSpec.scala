package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ManifestRead, ManifestSink}

/** The round-15 lake-tier claims, pinned where they are observable:
  * parquet payloads round-trip value-exact and decode only projected
  * columns, per-file stats publish at commit and prune scans losslessly,
  * selective DELETE/MERGE rewrite only candidate files (untouched files
  * carry BY NAME), identity-partitioned tables write partition-pure
  * sorted files and read back with KeyGroupedPartitioning + reported
  * ordering (zero-exchange joins and sort-free windows on STORED data),
  * and SQL time travel resolves snapshot generations.
  */
class LakeTableSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    s
  }

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_lake_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  private def withBucketing[T](body: => T): T = {
    val c = spark.conf
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.requireAllClusterKeysForCoPartition",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> c.getOption(k)).toMap
    try {
      c.set("spark.sql.sources.v2.bucketing.enabled", "true")
      c.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      c.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      // tiny spec tables must not dissolve the SPJ into a broadcast
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  test("parquet payload round-trips value-exact: escapes, nulls, NaN, long strings") {
    import spark.implicits._
    val root = freshRoot("pq_roundtrip")
    val long = "x" * 200 // > MaxStatString: poisons stats, must still round-trip
    val src = Seq(
      (1L, "plain", 1.5, "x"),
      (2L, "quote\"back\\slash", -0.25, null),
      (3L, "tab\tnew\nline", Double.NaN, long),
      (4L, "", 0.0, "y")
    ).toDF("k", "s", "d", "opt")
    src.write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).option("format", "parquet").save()
    val files = ManifestSink.committedFiles(root)
    assert(files.nonEmpty && files.forall(_.endsWith(".parquet")),
      s"parquet format must stage parquet payloads: $files")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        if (r.isNullAt(3)) null else r.getString(3))).toSet
    // helper read (Spark's vectorized parquet reader)
    assert(canon(ManifestSink.readCommitted(spark, root)) == canon(src))
    // connector read (the custom parquet partition reader)
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.pq_rt")
    spark.sql("CREATE TABLE graft_cat.lake.pq_rt (k BIGINT, s STRING, d DOUBLE, " +
      s"opt STRING) USING graft OPTIONS (path '$root')")
    assert(canon(spark.sql("SELECT * FROM graft_cat.lake.pq_rt")) == canon(src))
    spark.sql("DROP TABLE graft_cat.lake.pq_rt")
  }

  test("parquet pruned read decodes ONLY the projected columns") {
    import spark.implicits._
    val root = freshRoot("pq_prune")
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "w")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).option("format", "parquet").save()
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.pq_pr")
    spark.sql("CREATE TABLE graft_cat.lake.pq_pr (k BIGINT, v STRING, w BIGINT) " +
      s"USING graft OPTIONS (path '$root')")
    assert(spark.sql("SELECT v FROM graft_cat.lake.pq_pr")
      .collect().map(_.getString(0)).toSet == Set("a", "b"))
    // parquet-mr's projection contract: non-projected column chunks are
    // never decoded — the reader's requested schema is the proof surface
    assert(ManifestRead.lastParquetProjection.get() == Seq("v"),
      s"pruned parquet read must project only [v], got " +
        s"${ManifestRead.lastParquetProjection.get()}")
    spark.sql("DROP TABLE graft_cat.lake.pq_pr")
  }

  /** A 100-row, 10-partition-value table the skipping tests share. */
  private def makePartitioned(tag: String, format: String): String = {
    val root = freshRoot(tag)
    spark.sql(s"DROP TABLE IF EXISTS graft_cat.lake.$tag")
    spark.sql(s"CREATE TABLE graft_cat.lake.$tag (b BIGINT, k BIGINT, v STRING) " +
      s"USING graft PARTITIONED BY (b) " +
      s"OPTIONS (path '$root', format '$format', orderBy 'k')")
    import spark.implicits._
    // scrambled input: the layout must come from the declared transform
    (0L until 100L).map(i => (i * 37 % 100) / 10 -> (i * 37 % 100))
      .map { case (b, k) => (b, k, s"v$k") }
      .toDF("b", "k", "v").createOrReplaceTempView(s"src_$tag")
    spark.sql(s"INSERT INTO graft_cat.lake.$tag SELECT * FROM src_$tag")
    root
  }

  test("commit publishes per-file stats; min/max skipping prunes the scan losslessly") {
    val root = makePartitioned("skip_t", "parquet")
    val names = ManifestSink.committedFiles(root)
      .map(f => Paths.get(f).getFileName.toString)
    assert(names.size == 10, s"10 partition values -> 10 pure files: $names")
    val stats = ManifestSink.fileStats(root)
    assert(names.forall(stats.contains), "every committed file needs a stats line")
    // partition purity recorded: b min == max, null-free
    assert(stats.values.forall { fs =>
      val b = fs.cols("b"); b.min == b.max && b.nulls == 0L && fs.rows == 10L
    })
    // k is range-tight per file, and the sort claim is recorded
    assert(stats.values.forall(_.sorted == Seq("b", "k")))
    // a selective predicate reads only stats-overlapping files
    val out = spark.sql("SELECT k FROM graft_cat.lake.skip_t WHERE k >= 85")
      .collect().map(_.getLong(0)).toSet
    assert(out == (85L until 100L).toSet, "skipping must be lossless")
    val (kept, total) = ManifestRead.lastSkipLedger.get()
    assert(total == 10 && kept == 2,
      s"k >= 85 overlaps only files b=8 (80..89) and b=9: kept=$kept total=$total")
    spark.sql("DROP TABLE graft_cat.lake.skip_t")
  }

  test("partition-column equality reads exactly one file") {
    val root = makePartitioned("prune_t", "json")
    val out = spark.sql("SELECT k FROM graft_cat.lake.prune_t WHERE b = 3")
      .collect().map(_.getLong(0)).toSet
    assert(out == (30L until 40L).toSet)
    val (kept, total) = ManifestRead.lastSkipLedger.get()
    assert(total == 10 && kept == 1,
      s"b = 3 must prune to the one pure file: kept=$kept total=$total")
    spark.sql("DROP TABLE graft_cat.lake.prune_t")
  }

  test("selective DELETE rewrites only candidate files; untouched carry by name") {
    val root = makePartitioned("del_t", "parquet")
    val before = ManifestSink.committedFiles(root)
      .map(f => Paths.get(f).getFileName.toString).toSet
    assert(before.size == 10)
    spark.sql("DELETE FROM graft_cat.lake.del_t WHERE k >= 95")
    val after = ManifestSink.committedFiles(root)
      .map(f => Paths.get(f).getFileName.toString).toSet
    // only the b=9 file (k 90..99) could hold matches: the other 9
    // committed files must republish UNREWRITTEN — same names
    val carried = before.intersect(after)
    assert(carried.size == 9,
      s"9 of 10 files must carry by name: before=$before after=$after")
    // the rewritten b=9 successor holds exactly the survivors
    assert(spark.sql("SELECT k FROM graft_cat.lake.del_t")
      .collect().map(_.getLong(0)).toSet == (0L until 95L).toSet)
    // stats lines follow the file list: no stale entry for the replaced
    // file, fresh entry for its successor
    val stats = ManifestSink.fileStats(root)
    assert(stats.keySet == after, s"stats must track the live file set")
    // a DELETE whose predicate no file can satisfy is a metadata no-op
    val gens = ManifestSink.snapshots(root).size
    spark.sql("DELETE FROM graft_cat.lake.del_t WHERE k >= 1000")
    assert(ManifestSink.snapshots(root).size == gens,
      "an all-files-skipped DELETE must publish nothing")
    spark.sql("DROP TABLE graft_cat.lake.del_t")
  }

  test("pruned MERGE carries files outside the update-key range by name") {
    import spark.implicits._
    val root = freshRoot("merge_t")
    (0L until 100L).map(i => (i / 10, i, s"v$i")).toDF("b", "k", "v")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("partitionBy", "b").option("orderBy", "k").save()
    val before = ManifestSink.committedFiles(root)
      .map(f => Paths.get(f).getFileName.toString).toSet
    assert(before.size == 10)
    // phase 1: update keys 42 and 44 — only the b=4 file (k 40..49)
    // intersects the [42, 44] key envelope; the other 9 carry by name
    ManifestSink.merge(spark, root,
      Seq((4L, 42L, "UP42"), (4L, 44L, "UP44")).toDF("b", "k", "v"), Seq("k"))
    val after1 = ManifestSink.committedFiles(root)
      .map(f => Paths.get(f).getFileName.toString).toSet
    assert(before.intersect(after1).size == 9,
      s"only the k-range-overlapping file may rewrite: before=$before after=$after1")
    // phase 2: a pure INSERT (key 204 beyond every file's range) —
    // candidates empty, so ALL current files carry and the update appends
    ManifestSink.merge(spark, root,
      Seq((20L, 204L, "NEW")).toDF("b", "k", "v"), Seq("k"))
    val after2 = ManifestSink.committedFiles(root)
      .map(f => Paths.get(f).getFileName.toString).toSet
    assert(after1.subsetOf(after2),
      s"an out-of-range merge must rewrite nothing: $after1 -> $after2")
    val rows = ManifestSink.readCommitted(spark, root)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(rows.size == 101 && rows(42L) == "UP42" && rows(44L) == "UP44" &&
      rows(43L) == "v43" && rows(204L) == "NEW" && rows(0L) == "v0")
  }

  test("storage-partitioned join of two STORED lake tables: zero exchange, zero sort") {
    import SparkTestBase.collectInPlan
    import spark.implicits._
    withBucketing {
      val r1 = freshRoot("spj_a")
      val r2 = freshRoot("spj_b")
      spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spec_spj_a")
      spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spec_spj_b")
      spark.sql("CREATE TABLE graft_cat.lake.spec_spj_a (pb BIGINT, k BIGINT, x BIGINT) " +
        s"USING graft PARTITIONED BY (pb) OPTIONS (path '$r1', format 'parquet', orderBy 'k')")
      spark.sql("CREATE TABLE graft_cat.lake.spec_spj_b (pb BIGINT, k BIGINT, tag STRING) " +
        s"USING graft PARTITIONED BY (pb) OPTIONS (path '$r2', format 'parquet', orderBy 'k')")
      (0L until 400L).map(i => (i / 50, i, i * 3)).toDF("pb", "k", "x")
        .createOrReplaceTempView("spj_src_a")
      // side b misses some partitions (only k < 300): exercises the
      // partially-pushed partition-values path
      (0L until 300L).map(i => (i / 50, i, s"t${i % 7}")).toDF("pb", "k", "tag")
        .createOrReplaceTempView("spj_src_b")
      spark.sql("INSERT INTO graft_cat.lake.spec_spj_a SELECT * FROM spj_src_a")
      spark.sql("INSERT INTO graft_cat.lake.spec_spj_b SELECT * FROM spj_src_b")
      val joined = spark.sql(
        """SELECT a.pb, a.k, a.x, b.tag
          |FROM graft_cat.lake.spec_spj_a a
          |JOIN graft_cat.lake.spec_spj_b b ON a.pb = b.pb AND a.k = b.k""".stripMargin)
      val rows = joined.collect()
      assert(rows.length == 300)
      assert(rows.map(_.getLong(1)).toSet == (0L until 300L).toSet)
      val plan = joined.queryExecution.executedPlan
      val exchanges = collectInPlan(plan) {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
      val sorts = collectInPlan(plan) {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(exchanges.isEmpty,
        s"storage-partitioned lake join must plan with zero exchange:\n$plan")
      assert(sorts.isEmpty,
        s"reported (pb, k) ordering must delete both sort nodes:\n$plan")
      spark.sql("DROP TABLE graft_cat.lake.spec_spj_a")
      spark.sql("DROP TABLE graft_cat.lake.spec_spj_b")
    }
  }

  test("layout-aware window over the stored table: no sort, no exchange") {
    import SparkTestBase.collectInPlan
    withBucketing {
      makePartitioned("win_t", "parquet")
      val df = spark.sql(
        """SELECT * FROM (
          |  SELECT b, k, row_number() OVER (PARTITION BY b ORDER BY k) AS rn
          |  FROM graft_cat.lake.win_t)
          |WHERE rn <= 2""".stripMargin)
      val rows = df.collect()
      assert(rows.length == 20 &&
        rows.map(r => (r.getLong(0), r.getLong(1))).sorted.take(4).toSeq ==
          Seq((0L, 0L), (0L, 1L), (1L, 10L), (1L, 11L)))
      val plan = df.queryExecution.executedPlan
      assert(collectInPlan(plan) {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }.isEmpty, s"key-grouped scan must satisfy the window's clustering:\n$plan")
      assert(collectInPlan(plan) {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.isEmpty, s"reported (b, k) ordering must delete the window sort:\n$plan")
      spark.sql("DROP TABLE graft_cat.lake.win_t")
    }
  }

  test("duplicate partition keys (two appends): grouped read stays correct, ordering claim drops") {
    import spark.implicits._
    withBucketing {
      val root = freshRoot("dup_t")
      spark.sql("DROP TABLE IF EXISTS graft_cat.lake.dup_t")
      spark.sql("CREATE TABLE graft_cat.lake.dup_t (b BIGINT, k BIGINT) " +
        s"USING graft PARTITIONED BY (b) OPTIONS (path '$root', orderBy 'k')")
      (0L until 40L).map(i => (i / 10, i)).toDF("b", "k")
        .createOrReplaceTempView("dup_src1")
      (40L until 80L).map(i => (i % 4, i)).toDF("b", "k")
        .createOrReplaceTempView("dup_src2")
      spark.sql("INSERT INTO graft_cat.lake.dup_t SELECT * FROM dup_src1")
      spark.sql("INSERT INTO graft_cat.lake.dup_t SELECT * FROM dup_src2")
      // every b value now spans TWO files — the key-grouped rollup must
      // still be exact (Spark groups same-key partitions into one task)
      val out = spark.sql(
        "SELECT b, count(*) AS n, sum(k) AS s FROM graft_cat.lake.dup_t GROUP BY b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expect = ((0L until 40L).map(i => (i / 10, i)) ++
        (40L until 80L).map(i => (i % 4, i)))
        .groupBy(_._1).map { case (b, xs) => (b, xs.size.toLong, xs.map(_._2).sum) }
        .toSet
      assert(out == expect)
      spark.sql("DROP TABLE graft_cat.lake.dup_t")
    }
  }

  test("partition-preserving compaction restores one pure file per value") {
    import spark.implicits._
    withBucketing {
      val root = freshRoot("pcompact")
      spark.sql("DROP TABLE IF EXISTS graft_cat.lake.pcompact")
      spark.sql("CREATE TABLE graft_cat.lake.pcompact (b BIGINT, k BIGINT) " +
        s"USING graft PARTITIONED BY (b) OPTIONS (path '$root', orderBy 'k')")
      // two appends: every b value spans two files (ordering claim down)
      (0L until 40L).map(i => (i / 10, i)).toDF("b", "k")
        .createOrReplaceTempView("pc_src1")
      (40L until 80L).map(i => (i % 4, i)).toDF("b", "k")
        .createOrReplaceTempView("pc_src2")
      spark.sql("INSERT INTO graft_cat.lake.pcompact SELECT * FROM pc_src1")
      spark.sql("INSERT INTO graft_cat.lake.pcompact SELECT * FROM pc_src2")
      assert(ManifestSink.committedFiles(root).size == 8)
      ManifestSink.compact(spark, root, partitionBy = Seq("b"), orderBy = Seq("k"))
      ManifestSink.vacuum(root)
      // back to one pure file per value...
      val names = ManifestSink.committedFiles(root)
        .map(f => Paths.get(f).getFileName.toString)
      assert(names.size == 4, s"4 values -> 4 compacted files: $names")
      val stats = ManifestSink.fileStats(root)
      assert(names.forall(n => stats(n).cols("b").min == stats(n).cols("b").max))
      // ...rows identical, and the layout claims return: the window
      // plans sort-free and exchange-free again
      val df = spark.sql(
        """SELECT * FROM (SELECT b, k,
          |  row_number() OVER (PARTITION BY b ORDER BY k) AS rn
          |  FROM graft_cat.lake.pcompact) WHERE rn = 1""".stripMargin)
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((0L, 0L), (1L, 10L), (2L, 20L), (3L, 30L)))
      val plan = df.queryExecution.executedPlan
      assert(SparkTestBase.collectInPlan(plan) {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
        case s: org.apache.spark.sql.execution.SortExec => s
      }.isEmpty, s"compacted layout must restore the claims:\n$plan")
      // idempotent: a second partitioned compact changes nothing
      val manifestBefore = java.nio.file.Files
        .readAllBytes(Paths.get(root, "manifest.json")).toSeq
      ManifestSink.compact(spark, root, partitionBy = Seq("b"), orderBy = Seq("k"))
      assert(java.nio.file.Files.readAllBytes(
        Paths.get(root, "manifest.json")).toSeq == manifestBefore)
      spark.sql("DROP TABLE graft_cat.lake.pcompact")
    }
  }

  test("VERSION AS OF resolves generations; unknown generations fail loudly") {
    import spark.implicits._
    val root = freshRoot("tt_t")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.tt_t")
    spark.sql("CREATE TABLE graft_cat.lake.tt_t (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root')")
    spark.sql("INSERT INTO graft_cat.lake.tt_t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE graft_cat.lake.tt_t VALUES (9, 'z')")
    val Seq(g1, g2) = ManifestSink.snapshots(root)
    assert(spark.sql(s"SELECT k FROM graft_cat.lake.tt_t VERSION AS OF $g1")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(spark.sql(s"SELECT k FROM graft_cat.lake.tt_t VERSION AS OF $g2")
      .collect().map(_.getLong(0)).toSet == Set(9L))
    // live read unaffected
    assert(spark.sql("SELECT k FROM graft_cat.lake.tt_t")
      .collect().map(_.getLong(0)).toSet == Set(9L))
    val err = intercept[Exception] {
      spark.sql("SELECT k FROM graft_cat.lake.tt_t VERSION AS OF 9999").collect()
    }
    assert(err.getMessage.contains("available"),
      s"unknown generation must list available ones: ${err.getMessage}")
    spark.sql("DROP TABLE graft_cat.lake.tt_t")
  }

  test("unsupported PARTITIONED BY transforms are refused loudly, not " +
      "silently dropped (the temporal family, bucket and truncate are " +
      "honored since r19)") {
    val root = freshRoot("refuse_t")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.refuse_t")
    val err = intercept[Exception] {
      spark.sql("CREATE TABLE graft_cat.lake.refuse_t (k BIGINT) " +
        s"USING graft PARTITIONED BY (weeks(k)) OPTIONS (path '$root')")
    }
    assert(err.getMessage.contains("bucket/truncate"),
      s"unsupported transforms must be refused with the capability " +
        s"named: ${err.getMessage}")
  }

  test("metadata-only aggregates: count/min/max fold from stats, zero files opened") {
    makePartitioned("meta_t", "parquet")
    // grouped by the partition column: the whole answer comes from the
    // manifest — the plan's scan is the metadata ManifestAggScan
    val grouped = spark.sql(
      "SELECT b, count(*) AS n, count(v) AS nv, min(k) AS lo, max(k) AS hi, " +
        "sum(k) AS s FROM graft_cat.lake.meta_t GROUP BY b")
    val rows = grouped.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(rows == (0L until 10L).map(b =>
      (b, 10L, 10L, b * 10, b * 10 + 9, (b * 10 until b * 10 + 10).sum)).toSet)
    assert(grouped.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      s"grouped metadata aggregate must plan on the stats fold:\n" +
        grouped.queryExecution.executedPlan)
    // global shape too
    val global = spark.sql(
      "SELECT count(*) AS n, min(k) AS lo, max(k) AS hi FROM graft_cat.lake.meta_t")
    assert(global.collect().head.toSeq == Seq(100L, 0L, 99L))
    assert(global.queryExecution.executedPlan.toString.contains("ManifestAggScan"))
    // a FILTERED aggregate must NOT take the metadata path (stats ignore
    // filters) — and must still be exact
    val filtered = spark.sql(
      "SELECT count(*) AS n FROM graft_cat.lake.meta_t WHERE k >= 37")
    assert(filtered.collect().head.getLong(0) == 63L)
    assert(!filtered.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      "a filtered aggregate must read data, not stats")
    spark.sql("DROP TABLE graft_cat.lake.meta_t")
  }

  test("min/max pushdown refuses poisoned columns (NaN doubles) and stays exact") {
    import spark.implicits._
    val root = freshRoot("meta_nan")
    Seq((1L, 1.5), (2L, Double.NaN), (3L, -2.0)).toDF("k", "d")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).option("format", "parquet").save()
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.meta_nan")
    spark.sql("CREATE TABLE graft_cat.lake.meta_nan (k BIGINT, d DOUBLE) " +
      s"USING graft OPTIONS (path '$root')")
    val df = spark.sql("SELECT min(d) AS lo, max(d) AS hi FROM graft_cat.lake.meta_nan")
    // the NaN-bearing file dropped its bounds, so the stats CANNOT
    // answer exactly — the pushdown must refuse and the row-level
    // aggregate must produce Spark's own NaN-greatest semantics
    assert(!df.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      s"poisoned column must refuse metadata pushdown:\n${df.queryExecution.executedPlan}")
    val r = df.collect().head
    assert(r.getDouble(0) == -2.0 && r.getDouble(1).isNaN)
    // count(*) alone is still stats-answerable on the same table
    val c = spark.sql("SELECT count(*) AS n FROM graft_cat.lake.meta_nan")
    assert(c.collect().head.getLong(0) == 3L)
    assert(c.queryExecution.executedPlan.toString.contains("ManifestAggScan"))
    spark.sql("DROP TABLE graft_cat.lake.meta_nan")
  }

  test("SUM pushdown refuses on cross-file overflow; per-file overflow poisons the stat") {
    import spark.implicits._
    val root = freshRoot("meta_sum")
    // two appends: each file's sum is fine, their TOTAL overflows Long
    Seq((1L, Long.MaxValue - 10L)).toDF("k", "v")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    Seq((2L, 100L)).toDF("k", "v")
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).save()
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.meta_sum")
    spark.sql("CREATE TABLE graft_cat.lake.meta_sum (k BIGINT, v BIGINT) " +
      s"USING graft OPTIONS (path '$root')")
    val df = spark.sql("SELECT sum(v) AS s FROM graft_cat.lake.meta_sum")
    assert(!df.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      s"cross-file sum overflow must refuse the metadata path:\n" +
        df.queryExecution.executedPlan)
    // sum(k) alone still folds from stats, exactly
    val ok = spark.sql("SELECT sum(k) AS s, count(*) AS n FROM graft_cat.lake.meta_sum")
    assert(ok.queryExecution.executedPlan.toString.contains("ManifestAggScan"))
    assert(ok.collect().head.toSeq == Seq(3L, 2L))
    spark.sql("DROP TABLE graft_cat.lake.meta_sum")
  }

  test("Infinity doubles poison bounds but never brick the table") {
    import spark.implicits._
    val root = freshRoot("inf_t")
    Seq((1L, Double.PositiveInfinity), (2L, -3.5), (3L, Double.NegativeInfinity))
      .toDF("k", "d").coalesce(1) // one file: the infinities poison ITS bounds
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    // the stats line parses (Infinity never serialized as a bound) and
    // every read path — stats, scan, DELETE planning — stays healthy
    val stats = ManifestSink.fileStats(root)
    assert(stats.nonEmpty && stats.values.forall(_.cols("d").min.isEmpty),
      "an Infinity-bearing double column must drop its bounds")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.inf_t")
    spark.sql("CREATE TABLE graft_cat.lake.inf_t (k BIGINT, d DOUBLE) " +
      s"USING graft OPTIONS (path '$root')")
    val vals = spark.sql("SELECT d FROM graft_cat.lake.inf_t")
      .collect().map(_.getDouble(0)).toSet
    assert(vals == Set(Double.PositiveInfinity, -3.5, Double.NegativeInfinity),
      "infinities must round-trip through the data files")
    // min/max refuse the metadata path on the poisoned column; Spark's
    // row-level answer (with real IEEE infinities) takes over
    val mm = spark.sql("SELECT min(d) AS lo, max(d) AS hi FROM graft_cat.lake.inf_t")
    assert(!mm.queryExecution.executedPlan.toString.contains("ManifestAggScan"))
    val r = mm.collect().head
    assert(r.getDouble(0) == Double.NegativeInfinity &&
      r.getDouble(1) == Double.PositiveInfinity)
    spark.sql("DROP TABLE graft_cat.lake.inf_t")
  }

  test("COUNT(col) over pre-evolution files counts their rows as null (zero)") {
    val root = freshRoot("evo_cnt")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.evo_cnt")
    spark.sql("CREATE TABLE graft_cat.lake.evo_cnt (k BIGINT) " +
      s"USING graft OPTIONS (path '$root')")
    spark.sql("INSERT INTO graft_cat.lake.evo_cnt VALUES (1), (2), (3)")
    spark.sql("ALTER TABLE graft_cat.lake.evo_cnt ADD COLUMN c2 BIGINT")
    spark.sql("INSERT INTO graft_cat.lake.evo_cnt VALUES (4, 40), (5, NULL)")
    // the pre-ALTER file has no c2 stats ENTRY: its 3 rows read null
    // there and must contribute ZERO — and the pushdown stays EXACT, so
    // it is still the metadata scan (code-review r15: the over-count bug)
    val df = spark.sql(
      "SELECT count(c2) AS n, count(*) AS all, sum(c2) AS s, " +
        "min(c2) AS lo, max(c2) AS hi FROM graft_cat.lake.evo_cnt")
    assert(df.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      s"evolution must not cost the metadata path:\n${df.queryExecution.executedPlan}")
    val r = df.collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 5L && r.getLong(2) == 40L &&
      r.getLong(3) == 40L && r.getLong(4) == 40L,
      s"pre-evolution rows must count as null for the added column: $r")
    spark.sql("DROP TABLE graft_cat.lake.evo_cnt")
  }

  test("compact (re)establishes a missing sort order instead of no-opping") {
    import spark.implicits._
    val root = freshRoot("sortcompact")
    // pure one-file-per-value layout but WITHOUT the k order
    (0L until 40L).map(i => ((i / 10), (i * 7) % 40)).toDF("b", "k")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).option("partitionBy", "b").save()
    val before = ManifestSink.fileStats(root)
    assert(before.values.forall(_.sorted == Seq("b")),
      s"baseline files must carry only the partition sort claim: $before")
    // purity alone must NOT satisfy a compaction asked to order by k
    ManifestSink.compact(spark, root, partitionBy = Seq("b"), orderBy = Seq("k"))
    val after = ManifestSink.fileStats(root)
    assert(after.values.forall(_.sorted == Seq("b", "k")),
      s"compaction must rewrite to establish the asked order: $after")
    // and NOW it no-ops
    val manifestBytes = java.nio.file.Files
      .readAllBytes(Paths.get(root, "manifest.json")).toSeq
    ManifestSink.compact(spark, root, partitionBy = Seq("b"), orderBy = Seq("k"))
    assert(java.nio.file.Files.readAllBytes(
      Paths.get(root, "manifest.json")).toSeq == manifestBytes)
  }

  test("CTAS honors declared layout options on the returned table") {
    val root = freshRoot("ctas_t")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.ctas_t")
    import spark.implicits._
    (0L until 30L).map(i => ((i * 11) % 30, s"v$i")).toDF("k", "v")
      .createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE graft_cat.lake.ctas_t " +
      s"USING graft OPTIONS (path '$root', orderBy 'k') " +
      "AS SELECT * FROM ctas_src")
    // the CTAS write must flow through the declared orderBy: files are
    // internally sorted and say so (code-review r15 — createTable used
    // to return a table stripped of its layout options)
    val stats = ManifestSink.fileStats(root)
    assert(stats.nonEmpty && stats.values.forall(_.sorted == Seq("k")),
      s"CTAS must honor orderBy: $stats")
    assert(spark.sql("SELECT k FROM graft_cat.lake.ctas_t")
      .collect().map(_.getLong(0)).toSet == (0L until 30L).toSet)
    spark.sql("DROP TABLE graft_cat.lake.ctas_t")
  }

  test("runtime filtering drops committed files the join keys cannot touch") {
    val dir = "/root/testdata/sf0.001"
    // NOT under withBucketing: runtime-filter injection rides the
    // broadcast of the filtered dim side — disabling broadcast would
    // suppress the very mechanism under test
    val root = freshRoot("rtf_t")
    // 100k ids in 10 bucket files of 10k each
    spark.read.format("graft.sources.SynthDataSource")
      .option("rows", "100000").option("bucketWidth", "10000").load()
      .select(col("bucket"), col("id"), col("amount_cents"))
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet")
      .option("partitionBy", "bucket").option("orderBy", "id").save()
    val fact = spark.read.format("graft.sources.ManifestSink")
      .option("path", root).load()
      .select(col("id"), col("amount_cents"))
    // dim filter on a NON-join attribute: surviving keys known only at
    // runtime (sf0.001 orderkeys stay far below 100k, so whole bucket
    // files hold no joinable ids)
    val dim = graft.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val joined = dim.join(fact, col("o_orderkey") === col("id"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("amount_cents")).as("cents"))
    val n = joined.collect().map(_.getLong(1)).sum
    val (kept, before) = ManifestRead.lastRuntimeLedger.get()
    assert(before == 10 && kept >= 1 && kept < 10,
      s"runtime filter must drop key-free files: kept=$kept before=$before\n" +
        joined.queryExecution.executedPlan)
    // pruning is plan-only: every surviving dim key joins exactly once
    assert(n == graft.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderkey") < 100000L).count())
  }

  test("warehouse catalog persists table definitions across instances") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.connector.catalog.Identifier
    val wh = freshRoot("wh")
    val data = freshRoot("wh_data")
    def newCatalog(): graft.sources.GraftCatalog = {
      val c = new graft.sources.GraftCatalog
      c.initialize("graft_wh", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        Map("warehouse" -> wh).asJava))
      c
    }
    val ident = Identifier.of(Array("lake"), "persisted_t")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING")
    val c1 = newCatalog()
    c1.createTable(ident, schema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      Map("path" -> data).asJava)
    // a SECOND instance (a restarted session) sees the definition
    val c2 = newCatalog()
    val t = c2.loadTable(ident)
    assert(t.schema().toDDL == schema.toDDL)
    assert(c2.listTables(Array("lake")).map(_.name()).toSeq == Seq("persisted_t"))
    // ALTER persists too
    c1.alterTable(ident,
      org.apache.spark.sql.connector.catalog.TableChange.addColumn(
        Array("extra"), org.apache.spark.sql.types.LongType))
    assert(newCatalog().loadTable(ident).schema().fieldNames.toSeq ==
      Seq("k", "v", "extra"))
    // DROP persists: a fresh instance no longer sees it
    assert(c1.dropTable(ident))
    assert(newCatalog().listTables(Array("lake")).isEmpty)
    // without a warehouse option the catalog stays session-scoped
    val mem = new graft.sources.GraftCatalog
    mem.initialize("graft_mem",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    assert(mem.listTables(Array("lake")).isEmpty)
  }

  test("LIMIT pushdown plans only the file prefix whose stats cover n") {
    makePartitioned("limit_t", "parquet") // 10 files x 10 rows
    val out = spark.sql("SELECT count(*) AS n FROM " +
      "(SELECT k FROM graft_cat.lake.limit_t LIMIT 25)")
    assert(out.collect().head.getLong(0) == 25L)
    val (kept, total) = ManifestRead.lastSkipLedger.get()
    assert(total == 10 && kept == 3,
      s"LIMIT 25 over 10-row files needs exactly 3 files: kept=$kept total=$total")
    // an EXACTLY-pushed filter composes with the limit: k >= 50 splits
    // every file fully-in (b=5..9) or fully-out, so kept files hold
    // only surviving rows and the prefix may truncate again — 3 files
    // cover LIMIT 25 (r16: before exact pushdown this fell back to
    // skipping only)
    val covering = spark.sql("SELECT count(*) AS n FROM " +
      "(SELECT k FROM graft_cat.lake.limit_t WHERE k >= 50 LIMIT 25)")
    assert(covering.collect().head.getLong(0) == 25L)
    val (kept2, _) = ManifestRead.lastSkipLedger.get()
    assert(kept2 == 3,
      s"exactly-filtered limit must truncate over kept files: kept=$kept2")
    // a STRADDLING filter must not truncate the file list (the first n
    // stored rows are no longer the first n surviving rows)
    val straddling = spark.sql("SELECT count(*) AS n FROM " +
      "(SELECT k FROM graft_cat.lake.limit_t WHERE k >= 45 LIMIT 25)")
    assert(straddling.collect().head.getLong(0) == 25L)
    val (kept3, _) = ManifestRead.lastSkipLedger.get()
    assert(kept3 == 6, // k >= 45 skips b=0..3, straddles b=4: no truncation
      s"straddling-filtered limit must fall back to skipping only: kept=$kept3")
    spark.sql("DROP TABLE graft_cat.lake.limit_t")
  }

  test("metadata aggregates group by the full multi-column partition set") {
    import spark.implicits._
    val root = freshRoot("meta_multi")
    (0L until 60L).map(i => (i % 3, i % 2, i)).toDF("b", "c", "k")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet")
      .option("partitionBy", "b,c").option("orderBy", "k").save()
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.meta_multi")
    spark.sql("CREATE TABLE graft_cat.lake.meta_multi (b BIGINT, c BIGINT, " +
      s"k BIGINT) USING graft PARTITIONED BY (b, c) " +
      s"OPTIONS (path '$root', format 'parquet')")
    // the full partition set folds from stats, in either column order
    val g1 = spark.sql("SELECT b, c, count(*) AS n, sum(k) AS s " +
      "FROM graft_cat.lake.meta_multi GROUP BY b, c")
    assert(g1.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      s"multi-column partition grouping must fold from stats:\n${g1.queryExecution.executedPlan}")
    val expect = (0L until 60L).groupBy(i => (i % 3, i % 2))
      .map { case ((b, c), is) => (b, c, is.size.toLong, is.sum) }.toSet
    assert(g1.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet == expect)
    val g2 = spark.sql("SELECT c, b, count(*) AS n " +
      "FROM graft_cat.lake.meta_multi GROUP BY c, b")
    assert(g2.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      "column order must not matter")
    // a SUBSET grouping still folds: every file is pure per b alone,
    // so groups merge whole files across c — exact either way
    val g3 = spark.sql("SELECT b, count(*) AS n " +
      "FROM graft_cat.lake.meta_multi GROUP BY b")
    assert(g3.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      "a pure subset grouping must keep the metadata path")
    assert(g3.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 20L), (1L, 20L), (2L, 20L)))
    // a NON-pure column (k varies within files) refuses
    val g4 = spark.sql("SELECT k, count(*) AS n " +
      "FROM graft_cat.lake.meta_multi GROUP BY k")
    assert(!g4.queryExecution.executedPlan.toString.contains("ManifestAggScan"))
    assert(g4.collect().length == 60)
    spark.sql("DROP TABLE graft_cat.lake.meta_multi")
  }

  test("covering filters compose with metadata aggregates; straddling refuses") {
    makePartitioned("cov_t", "parquet")
    // partition-equality: every file is fully-in or fully-out — the
    // grouped fold over KEPT files is exact and plans metadata-only
    val cov = spark.sql("SELECT b, count(*) AS n, sum(k) AS s " +
      "FROM graft_cat.lake.cov_t WHERE b = 3 GROUP BY b")
    assert(cov.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      s"covering filter must keep the metadata path:\n${cov.queryExecution.executedPlan}")
    assert(cov.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((3L, 10L, (30L until 40L).sum)))
    // a covering RANGE over a non-partition column works too: k >= 50
    // splits files exactly at a file boundary
    val rng = spark.sql("SELECT count(*) AS n, min(k) AS lo " +
      "FROM graft_cat.lake.cov_t WHERE k >= 50")
    assert(rng.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      s"boundary-covering range must keep the metadata path:\n${rng.queryExecution.executedPlan}")
    assert(rng.collect().head.toSeq == Seq(50L, 50L))
    // a STRADDLING predicate refuses: file b=3 holds both k<37 and k>=37
    val strad = spark.sql(
      "SELECT count(*) AS n FROM graft_cat.lake.cov_t WHERE k >= 37")
    assert(!strad.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      "a straddling filter must refuse the metadata path")
    assert(strad.collect().head.getLong(0) == 63L)
    spark.sql("DROP TABLE graft_cat.lake.cov_t")
  }

  test("TIMESTAMP AS OF: strictly increasing commit instants resolve generations") {
    import spark.implicits._
    val root = freshRoot("ts_t")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.ts_t")
    spark.sql("CREATE TABLE graft_cat.lake.ts_t (k BIGINT) " +
      s"USING graft OPTIONS (path '$root')")
    spark.sql("INSERT INTO graft_cat.lake.ts_t VALUES (1), (2)")
    spark.sql("INSERT OVERWRITE graft_cat.lake.ts_t VALUES (9)")
    val ledger = ManifestSink.snapshotTimestamps(root)
    assert(ledger.size == 2 && ledger(0)._2 < ledger(1)._2,
      s"commit instants must strictly increase: $ledger")
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
    def asOf(ms: Long) = spark.sql(
      s"SELECT k FROM graft_cat.lake.ts_t TIMESTAMP AS OF " +
        s"'${fmt.format(java.time.Instant.ofEpochMilli(ms))}'")
      .collect().map(_.getLong(0)).toSet
    // at gen1's instant: gen1; one millisecond before gen2: still gen1;
    // at gen2's instant: gen2
    assert(asOf(ledger(0)._2) == Set(1L, 2L))
    assert(asOf(ledger(1)._2 - 1) == Set(1L, 2L))
    assert(asOf(ledger(1)._2) == Set(9L))
    // before the first commit: loud failure listing the window
    val err = intercept[Exception] {
      asOf(ledger(0)._2 - 1000)
    }
    assert(err.getMessage.contains("available commit instants"),
      s"pre-history timestamp must fail loudly: ${err.getMessage}")
    spark.sql("DROP TABLE graft_cat.lake.ts_t")
  }

  test("task sizing: small files bin-pack into bounded partitions; big stay 1:1") {
    import spark.implicits._
    val root = freshRoot("pack_t")
    (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(10) // 10 small committed files
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    assert(ManifestSink.committedFiles(root).size == 10)
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.pack_t")
    // every file costs max(size, 1MB); bins close past 3MB -> 3 files
    // per bin -> 4 partitions of 10 files, deterministically
    spark.sql("CREATE TABLE graft_cat.lake.pack_t (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root', " +
      "openCostBytes '1000000', targetSplitBytes '3000000')")
    val df = spark.sql("SELECT k FROM graft_cat.lake.pack_t")
    assert(df.rdd.getNumPartitions == 4,
      s"10 tiny files at 3 per bin must plan 4 tasks, " +
        s"got ${df.rdd.getNumPartitions}")
    assert(df.collect().map(_.getLong(0)).toSet == (0L until 100L).toSet,
      "concatenated bins must deliver every row exactly once")
    // a table declared with no sizing overrides uses the 128MB/4MB
    // defaults: the same 10 tiny files pack into ONE task
    spark.sql("DROP TABLE graft_cat.lake.pack_t")
    spark.sql("CREATE TABLE graft_cat.lake.pack_t (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root')")
    assert(spark.sql("SELECT k FROM graft_cat.lake.pack_t")
      .rdd.getNumPartitions == 1)
    spark.sql("DROP TABLE graft_cat.lake.pack_t")
  }

  test("empty paths: fresh table, delete-to-empty, metadata aggs over zero files") {
    import spark.implicits._
    val root = freshRoot("empty_t")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.empty_t")
    spark.sql("CREATE TABLE graft_cat.lake.empty_t (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root')")
    // no manifest yet: scans and aggregates see an empty table
    assert(spark.sql("SELECT * FROM graft_cat.lake.empty_t").collect().isEmpty)
    assert(spark.sql("SELECT count(*) AS n FROM graft_cat.lake.empty_t")
      .collect().head.getLong(0) == 0L)
    // delete-to-empty: a manifest with ZERO files publishes and reads
    spark.sql("INSERT INTO graft_cat.lake.empty_t VALUES (1, 'a'), (2, 'b')")
    spark.sql("DELETE FROM graft_cat.lake.empty_t WHERE k > 0")
    assert(ManifestSink.committedFiles(root).isEmpty,
      "deleting every row must leave an empty committed file set")
    assert(spark.sql("SELECT * FROM graft_cat.lake.empty_t").collect().isEmpty)
    // SQL aggregate semantics over the empty state: count 0, min/max null
    val agg = spark.sql(
      "SELECT count(*) AS n, min(k) AS lo, max(k) AS hi FROM graft_cat.lake.empty_t")
      .collect().head
    assert(agg.getLong(0) == 0L && agg.isNullAt(1) && agg.isNullAt(2))
    // and writing after the empty state works
    spark.sql("INSERT INTO graft_cat.lake.empty_t VALUES (7, 'z')")
    assert(spark.sql("SELECT k FROM graft_cat.lake.empty_t")
      .collect().map(_.getLong(0)).toSet == Set(7L))
    spark.sql("DROP TABLE graft_cat.lake.empty_t")
  }

  test("mixed payload formats coexist in one manifest") {
    import spark.implicits._
    val root = freshRoot("mixed_t")
    Seq((1L, "j")).toDF("k", "v")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    Seq((2L, "p")).toDF("k", "v")
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).option("format", "parquet").save()
    val names = ManifestSink.committedFiles(root)
    assert(names.exists(_.endsWith(".json")) && names.exists(_.endsWith(".parquet")))
    assert(ManifestSink.readCommitted(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "j"), (2L, "p")))
    // the connector read dispatches per file too
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.mixed_t")
    spark.sql("CREATE TABLE graft_cat.lake.mixed_t (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root')")
    assert(spark.sql("SELECT k, v FROM graft_cat.lake.mixed_t")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "j"), (2L, "p")))
    spark.sql("DROP TABLE graft_cat.lake.mixed_t")
  }

  test("selective DELETE preserves format, purity, and sort claims (ADVICE r15)") {
    val root = makePartitioned("del_layout", "parquet")
    spark.sql("DELETE FROM graft_cat.lake.del_layout WHERE k = 95")
    val names = ManifestSink.committedFiles(root)
      .map(f => Paths.get(f).getFileName.toString)
    // format preserved: the rewritten b=9 successor is parquet like the
    // 9 carried files, not a silent JSON demotion
    assert(names.forall(_.endsWith(".parquet")),
      s"DELETE rewrite must keep the table's parquet format: $names")
    // layout preserved: every live file (the successor included) is
    // still partition-pure on b and still carries the (b, k) sort claim
    val stats = ManifestSink.fileStats(root)
    assert(names.forall(stats.contains))
    assert(stats.values.forall { fs =>
      val b = fs.cols("b"); b.min == b.max && b.nulls == 0L
    }, "DELETE must not demote partition purity")
    assert(stats.values.forall(_.sorted.startsWith(Seq("b", "k"))),
      "DELETE must not drop the sort claim")
    // the capability the claims serve survives: grouped metadata
    // aggregates still plan the zero-file ManifestAggScan
    val g = spark.sql(
      "SELECT b, count(*) AS n FROM graft_cat.lake.del_layout GROUP BY b")
    assert(g.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      s"post-DELETE table must keep metadata-agg purity:\n${g.queryExecution.executedPlan}")
    assert(g.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      (0L to 9L).map(b => b -> (if (b == 9L) 9L else 10L)).toMap)
    spark.sql("DROP TABLE graft_cat.lake.del_layout")
  }

  test("MERGE rewrite derives and keeps the table's layout from stats") {
    import spark.implicits._
    val root = freshRoot("merge_layout")
    (0L until 100L).map(i => (i / 10, i, s"v$i")).toDF("b", "k", "v")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet")
      .option("partitionBy", "b").option("orderBy", "k").save()
    ManifestSink.merge(spark, root,
      Seq((4L, 42L, "UP42")).toDF("b", "k", "v"), Seq("k"))
    val names = ManifestSink.committedFiles(root)
      .map(f => Paths.get(f).getFileName.toString)
    assert(names.forall(_.endsWith(".parquet")),
      s"MERGE rewrite must keep parquet: $names")
    val stats = ManifestSink.fileStats(root)
    assert(names.forall(n => stats.get(n).exists { fs =>
      val b = fs.cols("b")
      b.min == b.max && b.nulls == 0L && fs.sorted.startsWith(Seq("b", "k"))
    }), "MERGE must re-derive partitionBy/orderBy from the committed stats")
    assert(ManifestSink.readCommitted(spark, root)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
      .view.filterKeys(Seq(41L, 42L, 43L).contains).toMap ==
      Map(41L -> "v41", 42L -> "UP42", 43L -> "v43"))
  }

  test("a damaged stats line degrades reads but never bricks a replace commit") {
    import spark.implicits._
    val root = freshRoot("dmg_stats")
    (0L until 40L).map(i => (i / 10, i)).toDF("b", "k")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("partitionBy", "b").save()
    // damage one stats line in place (simulated bit-rot / hand edit) —
    // stats lines live in the commit's segment file
    val segDir = Paths.get(root, "_segments")
    val seg = Files.list(segDir).iterator().next()
    val lines = Files.readAllLines(seg)
    val idx = (0 until lines.size).find(i => lines.get(i).startsWith("#s:")).get
    lines.set(idx, "#s:" + lines.get(idx).drop(3).takeWhile(_ != ':') + ":{broken")
    Files.write(seg, lines)
    // reads degrade (the damaged file just loses skipping)…
    assert(ManifestSink.readCommitted(spark, root).count() == 40L)
    // …and the replace-commit path (DELETE) survives the damaged line
    // instead of throwing inside the ledger filter (ADVICE r15)
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.dmg_stats")
    spark.sql("CREATE TABLE graft_cat.lake.dmg_stats (b BIGINT, k BIGINT) " +
      s"USING graft OPTIONS (path '$root')")
    spark.sql("DELETE FROM graft_cat.lake.dmg_stats WHERE k >= 35")
    assert(spark.sql("SELECT k FROM graft_cat.lake.dmg_stats")
      .collect().map(_.getLong(0)).toSet == (0L until 35L).toSet)
    spark.sql("DROP TABLE graft_cat.lake.dmg_stats")
  }

  test("-0.0 and 0.0 are ONE partition key and one metadata group (ADVICE r15)") {
    import spark.implicits._
    val root = freshRoot("zero_t")
    Seq((1L, -0.0d), (2L, 0.0d), (3L, 1.5d)).toDF("k", "d")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("partitionBy", "d").save()
    // the writer's file roll groups signed zeros: 2 partition values ->
    // 2 files, not 3
    assert(ManifestSink.committedFiles(root).size == 2,
      s"signed zeros must share one partition file: ${ManifestSink.committedFiles(root)}")
    // recorded bounds are normalized to +0.0
    val stats = ManifestSink.fileStats(root)
    val zeroFile = stats.values.find(_.cols("d").min.contains(0.0d)).get
    assert(zeroFile.cols("d").max.contains(0.0d) && zeroFile.rows == 2L)
    // the grouped metadata fold answers ONE row for the zero group —
    // matching Spark's own signed-zero grouping semantics
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.zero_t")
    spark.sql("CREATE TABLE graft_cat.lake.zero_t (d DOUBLE, k BIGINT) " +
      s"USING graft PARTITIONED BY (d) OPTIONS (path '$root')")
    val g = spark.sql("SELECT d, count(*) AS n FROM graft_cat.lake.zero_t GROUP BY d")
    assert(g.queryExecution.executedPlan.toString.contains("ManifestAggScan"))
    assert(g.collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap ==
      Map(0.0d -> 2L, 1.5d -> 1L))
    spark.sql("DROP TABLE graft_cat.lake.zero_t")
  }

  test("snapshot feed refuses a non-append snapshot in the consumed range") {
    import spark.implicits._
    val root = freshRoot("feed_guard")
    Seq((1L, "a")).toDF("k", "v")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    Seq((2L, "b")).toDF("k", "v")
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).save()
    ManifestSink.compact(spark, root) // gen 3: a REPLACE snapshot
    val gens = ManifestSink.snapshots(root)
    assert(gens.size == 3)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v STRING")
    val stream = new graft.sources.ManifestSnapshotStream(root, schema, schema)
    // a pure-append range still plans (gen1 -> gen2 added one file)
    assert(stream.planInputPartitions(
      graft.sources.SnapshotOffset(1L), graft.sources.SnapshotOffset(2L)).length == 1)
    // a range crossing the compaction must fail LOUDLY, naming the
    // removal — silent re-delivery of rewritten rows is the bug
    val err = intercept[IllegalStateException] {
      stream.planInputPartitions(
        graft.sources.SnapshotOffset(2L), graft.sources.SnapshotOffset(3L))
    }
    assert(err.getMessage.contains("non-append snapshot"),
      s"unexpected message: ${err.getMessage}")
  }

  test("parquet scans decode COLUMNAR: vectorized batches, constants for metadata") {
    import spark.implicits._
    val root = freshRoot("vec_t")
    Seq((1L, "a", 1.5, 10), (2L, "b", -2.0, 20), (3L, null: String, 0.25, 30))
      .toDF("k", "s", "d", "i")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).option("format", "parquet").save()
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.vec_t")
    spark.sql("CREATE TABLE graft_cat.lake.vec_t (k BIGINT, s STRING, d DOUBLE, " +
      s"i INT) USING graft OPTIONS (path '$root')")
    // the scan plans COLUMNAR (ColumnarToRow above the v2 scan) …
    val df = spark.sql("SELECT k, s, d, i FROM graft_cat.lake.vec_t")
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      s"parquet lake scan must read vectorized:\n${df.queryExecution.executedPlan}")
    // … and is value-exact, nulls included
    assert(df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getString(1), r.getDouble(2), r.getInt(3))).toSet ==
      Set((1L, "a", 1.5, 10), (2L, "b", -2.0, 20), (3L, null, 0.25, 30)))
    // provenance metadata + schema evolution ride as per-file constants
    spark.sql("ALTER TABLE graft_cat.lake.vec_t ADD COLUMN extra BIGINT")
    val meta = spark.sql(
      "SELECT k, _file, _epoch, extra FROM graft_cat.lake.vec_t")
    assert(meta.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    val rows = meta.collect()
    assert(rows.forall(r => r.getString(1).endsWith(".parquet") &&
      r.getLong(2) == -1L && r.isNullAt(3)))
    // the all-constants projection (ONLY a post-evolution column): the
    // batch reader must still drive row counts off the file with an
    // empty decode schema
    val evoOnly = spark.sql("SELECT extra FROM graft_cat.lake.vec_t")
    assert(evoOnly.collect().length == 3 && evoOnly.collect().forall(_.isNullAt(0)))
    assert(spark.sql("SELECT count(*) AS n FROM graft_cat.lake.vec_t WHERE extra IS NULL")
      .collect().head.getLong(0) == 3L)
    // a JSON-payload table still reads through the row path, correctly
    val jroot = freshRoot("vec_json")
    Seq((5L, "j")).toDF("k", "s")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", jroot).save()
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.vec_json")
    spark.sql("CREATE TABLE graft_cat.lake.vec_json (k BIGINT, s STRING) " +
      s"USING graft OPTIONS (path '$jroot')")
    val jdf = spark.sql("SELECT k, s FROM graft_cat.lake.vec_json")
    assert(!jdf.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(jdf.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((5L, "j")))
    spark.sql("DROP TABLE graft_cat.lake.vec_t")
    spark.sql("DROP TABLE graft_cat.lake.vec_json")
  }

  test("MoR DELETE: O(predicate) metadata write, exact reads, compaction folds") {
    import spark.implicits._
    val root = freshRoot("mor_t")
    (0L until 100L).map(i => (i / 10, i, s"v$i")).toDF("b", "k", "v")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet")
      .option("partitionBy", "b").option("orderBy", "k").save()
    val filesBefore = ManifestSink.committedFiles(root).toSet
    val dataBytesBefore = filesBefore.toSeq.map(f => Files.size(Paths.get(f))).sum
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.mor_t")
    spark.sql("CREATE TABLE graft_cat.lake.mor_t (b BIGINT, k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root', deleteMode 'mor')")
    spark.sql("DELETE FROM graft_cat.lake.mor_t WHERE k >= 35 AND k < 55")
    // O(predicate) write: ZERO data files rewritten, zero new files —
    // the whole delete is one manifest tombstone line
    assert(ManifestSink.committedFiles(root).toSet == filesBefore,
      "a MoR delete must rewrite no data files")
    assert(ManifestSink.committedFiles(root).toSeq
      .map(f => Files.size(Paths.get(f))).sum == dataBytesBefore)
    val dLines = Files.readAllLines(Paths.get(root, "manifest.json"))
      .toArray(Array.empty[String]).filter(_.startsWith("#d:"))
    assert(dLines.length == 1, s"exactly one tombstone line: ${dLines.toSeq}")
    // the tombstone names only the stats-overlapping candidates (files
    // b=3,4,5 hold k in [30,59])
    val t = graft.sources.ManifestDeletes.parseLine(dLines.head).get
    assert(t.files.size == 3, s"only 3 of 10 files overlap [35,55): ${t.files}")
    // reads are exact through every surface: connector scan…
    assert(spark.sql("SELECT k FROM graft_cat.lake.mor_t")
      .collect().map(_.getLong(0)).toSet ==
      ((0L until 35L) ++ (55L until 100L)).toSet)
    // …the helper read, and a keyed aggregate
    assert(ManifestSink.readCommitted(spark, root).count() == 80L)
    assert(spark.sql("SELECT count(*) AS n FROM graft_cat.lake.mor_t WHERE b = 3")
      .collect().head.getLong(0) == 5L) // k 35..39 deleted, 30..34 survive
    assert(spark.sql("SELECT count(*) AS n FROM graft_cat.lake.mor_t WHERE b = 4")
      .collect().head.getLong(0) == 0L) // k 40..49 all inside [35,55)
    // metadata aggregates refuse while a tombstone stands (stats
    // overcount); the row answer stays exact
    val agg = spark.sql("SELECT count(*) AS n FROM graft_cat.lake.mor_t")
    assert(!agg.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      "tombstoned tables must refuse the metadata-aggregate path")
    assert(agg.collect().head.getLong(0) == 80L)
    // time travel: the pre-delete snapshot still sees all 100 rows
    val Seq(gOld, gNew) = ManifestSink.snapshots(root).takeRight(2)
    assert(ManifestSink.readSnapshot(spark, root, gOld).count() == 100L)
    assert(ManifestSink.readSnapshot(spark, root, gNew).count() == 80L)
    // compaction FOLDS the tombstone: clean files, no #d: lines, counts
    // unchanged, metadata aggregates restored
    ManifestSink.compact(spark, root, partitionBy = Seq("b"), orderBy = Seq("k"))
    assert(Files.readAllLines(Paths.get(root, "manifest.json"))
      .toArray(Array.empty[String]).count(_.startsWith("#d:")) == 0,
      "compaction must fold tombstones away")
    assert(ManifestSink.readCommitted(spark, root).count() == 80L)
    val agg2 = spark.sql("SELECT count(*) AS n FROM graft_cat.lake.mor_t")
    assert(agg2.queryExecution.executedPlan.toString.contains("ManifestAggScan"),
      "folding the tombstone must restore the metadata path")
    assert(agg2.collect().head.getLong(0) == 80L)
    spark.sql("DROP TABLE graft_cat.lake.mor_t")
  }

  test("columnar decision is scan-global: partial tombstones and mixed formats demote ALL partitions") {
    import spark.implicits._
    // key-grouped parquet table (one partition per file) with a partial
    // tombstone: per-partition columnar answers would make Spark refuse
    // the plan outright ("Cannot mix row-based and columnar input
    // partitions") — the whole scan must demote to rows (code-review r16)
    val root = freshRoot("mor_kg")
    (0L until 100L).map(i => (i / 10, i)).toDF("b", "k")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet")
      .option("partitionBy", "b").option("orderBy", "k").save()
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.mor_kg")
    spark.sql("CREATE TABLE graft_cat.lake.mor_kg (b BIGINT, k BIGINT) " +
      "USING graft PARTITIONED BY (b) " +
      s"OPTIONS (path '$root', format 'parquet', deleteMode 'mor')")
    spark.sql("DELETE FROM graft_cat.lake.mor_kg WHERE k >= 95")
    val df = spark.sql("SELECT k FROM graft_cat.lake.mor_kg")
    assert(!df.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "a partially tombstoned scan must demote to rows everywhere")
    assert(df.collect().map(_.getLong(0)).toSet == (0L until 95L).toSet)
    spark.sql("DROP TABLE graft_cat.lake.mor_kg")
    // mixed json+parquet files forced into SEPARATE bins: same rule
    val root2 = freshRoot("mixed_bins")
    Seq((1L, "j")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root2).save()
    Seq((2L, "p")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root2).option("format", "parquet").save()
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.mixed_bins")
    spark.sql("CREATE TABLE graft_cat.lake.mixed_bins (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root2', targetSplitBytes '1', openCostBytes '1')")
    val mixed = spark.sql("SELECT k, v FROM graft_cat.lake.mixed_bins")
    assert(mixed.rdd.getNumPartitions == 2,
      s"tiny split bytes must separate the two files: ${mixed.rdd.getNumPartitions}")
    assert(mixed.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "j"), (2L, "p")))
    spark.sql("DROP TABLE graft_cat.lake.mixed_bins")
  }

  test("MoR refuses non-finite double literals before publishing anything") {
    import spark.implicits._
    val root = freshRoot("mor_inf")
    Seq((1L, 1.5), (2L, -3.0)).toDF("k", "d").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    val gens = ManifestSink.snapshots(root).size
    val err = intercept[IllegalArgumentException] {
      ManifestSink.deleteWhereMoR(root, Array(
        org.apache.spark.sql.sources.LessThan("d", Double.PositiveInfinity)))
    }
    assert(err.getMessage.contains("non-finite"), err.getMessage)
    // nothing published: the table stays fully readable
    assert(ManifestSink.snapshots(root).size == gens)
    assert(ManifestSink.readCommitted(spark, root).count() == 2L)
  }

  test("insert-only MERGE on a table with standing tombstones appends cleanly") {
    import spark.implicits._
    val root = freshRoot("mor_insmerge")
    (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    assert(ManifestSink.deleteWhereMoR(root, Array(
      org.apache.spark.sql.sources.EqualTo("k", 7L))))
    // key 1000 is outside every file's range: zero candidates, but the
    // deletes map is non-empty — the survivors read must not crash on
    // an empty file group (code-review r16)
    ManifestSink.merge(spark, root,
      Seq((1000L, "NEW")).toDF("k", "v"), Seq("k"))
    val rows = ManifestSink.readCommitted(spark, root)
      .collect().map(r => r.getLong(0)).toSet
    assert(rows == ((0L until 50L).toSet - 7L) + 1000L)
  }

  test("bloom skipping refutes in-range point lookups; oversize strings drop the bloom") {
    import spark.implicits._
    val root = freshRoot("bloom_t")
    // keys hash-scattered across 4 files: every file's [min,max] covers
    // the whole domain, so only the bloom can prune
    (0L until 400L).map(i => (i, s"s$i")).toDF("k", "s").repartition(4)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet").option("bloomFor", "k,s").save()
    val stats = ManifestSink.fileStats(root)
    assert(stats.values.forall(fs => fs.cols("k").bloom.isDefined &&
      fs.cols("s").bloom.isDefined), "opted-in columns must record blooms")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.bloom_t")
    spark.sql("CREATE TABLE graft_cat.lake.bloom_t (k BIGINT, s STRING) " +
      s"USING graft OPTIONS (path '$root', bloomFor 'k,s')")
    // a single-key lookup reads only the file(s) whose bloom may hold it
    val one = spark.sql("SELECT s FROM graft_cat.lake.bloom_t WHERE k = 137")
      .collect().map(_.getString(0)).toSeq
    assert(one == Seq("s137"))
    val (kept, total) = ManifestRead.lastSkipLedger.get()
    assert(total == 4 && kept < 4,
      s"bloom must prune in-range files: kept=$kept total=$total")
    // string lookups prune the same way
    spark.sql("SELECT k FROM graft_cat.lake.bloom_t WHERE s = 's77'").collect()
    val (kept2, _) = ManifestRead.lastSkipLedger.get()
    assert(kept2 < 4, s"string bloom must prune: kept=$kept2")
    // an absent key inside the range: usually zero files read, always
    // zero rows — false positives cost reads, never rows
    assert(spark.sql("SELECT k FROM graft_cat.lake.bloom_t WHERE k = -5")
      .collect().isEmpty)
    // maintenance must not strip the opt-in: a compaction re-derives
    // the bloom columns from the files it rewrites (code-review r16)
    ManifestSink.compact(spark, root, targetFiles = 2)
    val statsAfter = ManifestSink.fileStats(root)
    assert(statsAfter.values.forall(fs => fs.cols("k").bloom.isDefined &&
      fs.cols("s").bloom.isDefined),
      "compaction must re-opt-in the committed bloom columns")
    assert(spark.sql("SELECT s FROM graft_cat.lake.bloom_t WHERE k = 137")
      .collect().map(_.getString(0)).toSeq == Seq("s137"))
    spark.sql("DROP TABLE graft_cat.lake.bloom_t")
    // SOUNDNESS: a column that poisons its stats mid-file (oversize
    // string) must drop the bloom — a partial bloom would wrongly
    // refute values written after the poisoning
    val root2 = freshRoot("bloom_poison")
    Seq((1L, "short"), (2L, "x" * 200), (3L, "after"))
      .toDF("k", "s").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root2)
      .option("format", "parquet").option("bloomFor", "s").save()
    val st2 = ManifestSink.fileStats(root2).values.head
    assert(st2.cols("s").bloom.isEmpty,
      "a poisoned string column must drop its (incomplete) bloom")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.bloom_p")
    spark.sql("CREATE TABLE graft_cat.lake.bloom_p (k BIGINT, s STRING) " +
      s"USING graft OPTIONS (path '$root2', bloomFor 's')")
    assert(spark.sql("SELECT k FROM graft_cat.lake.bloom_p WHERE s = 'after'")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    spark.sql("DROP TABLE graft_cat.lake.bloom_p")
  }

  test("targetFileBytes rolls oversized files; purity and reads survive") {
    import spark.implicits._
    val root = freshRoot("roll_t")
    // one partition value, one task, ~40KB of rows, 8KB target: the
    // size roll must split what the partition roll never would
    (0L until 2000L).map(i => (7L, i, s"value_$i")).toDF("b", "k", "v")
      .coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet")
      .option("partitionBy", "b").option("orderBy", "k")
      .option("targetFileBytes", "8192").save()
    val names = ManifestSink.committedFiles(root)
    assert(names.size > 1, s"8KB target over ~40KB must roll: ${names.size}")
    val stats = ManifestSink.fileStats(root)
    // every rolled file is still partition-pure and carries the claim —
    // and is NON-EMPTY with defined bounds (a roll firing on the last
    // row must not stage a zero-row file whose None==None "purity"
    // would silently demote the table — code-review r16)
    assert(stats.values.forall { fs =>
      val b = fs.cols("b")
      fs.rows >= 1L && b.min.isDefined && b.min == b.max && b.nulls == 0L &&
        fs.sorted.startsWith(Seq("b", "k"))
    })
    assert(stats.values.map(_.rows).sum == 2000L)
    // reads reassemble exactly; the duplicate-key grouping rule applies
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.roll_t")
    spark.sql("CREATE TABLE graft_cat.lake.roll_t (b BIGINT, k BIGINT, " +
      s"v STRING) USING graft PARTITIONED BY (b) OPTIONS (path '$root')")
    assert(spark.sql("SELECT count(*) AS n, sum(k) AS s FROM graft_cat.lake.roll_t")
      .collect().head.toSeq == Seq(2000L, (0L until 2000L).sum))
    // JSON payloads roll on their tracked byte count too
    val root2 = freshRoot("roll_json")
    (0L until 500L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root2)
      .option("targetFileBytes", "2048").save()
    assert(ManifestSink.committedFiles(root2).size > 1)
    assert(ManifestSink.readCommitted(spark, root2).count() == 500L)
    spark.sql("DROP TABLE graft_cat.lake.roll_t")
  }

  test("MoR upsert is one atomic snapshot: tombstone + append, zero rewrites") {
    import spark.implicits._
    val root = freshRoot("mor_upsert")
    (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v").repartition(4)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).option("format", "parquet").save()
    val filesBefore = ManifestSink.committedFiles(root).toSet
    val gensBefore = ManifestSink.snapshots(root).size
    ManifestSink.mergeMoR(spark, root,
      Seq((7L, "UP7"), (100L, "NEW")).toDF("k", "v"), Seq("k"))
    // ONE new snapshot carrying both the tombstone and the inserts
    assert(ManifestSink.snapshots(root).size == gensBefore + 1,
      "MoR upsert must publish exactly one snapshot")
    // zero existing files rewritten; only the update file(s) appended
    assert(filesBefore.subsetOf(ManifestSink.committedFiles(root).toSet))
    val rows = ManifestSink.readCommitted(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows.size == 51 && rows(7L) == "UP7" && rows(100L) == "NEW" &&
      rows(6L) == "v6")
    // the connector scan agrees (tombstone + new file through DSv2)
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.mor_up")
    spark.sql("CREATE TABLE graft_cat.lake.mor_up (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root')")
    assert(spark.sql("SELECT v FROM graft_cat.lake.mor_up WHERE k = 7")
      .collect().map(_.getString(0)).toSeq == Seq("UP7"))
    spark.sql("DROP TABLE graft_cat.lake.mor_up")
    // the key-set bound refuses loudly, nothing published
    val gens2 = ManifestSink.snapshots(root).size
    val err = intercept[IllegalArgumentException] {
      ManifestSink.mergeMoR(spark, root,
        (0L until 40L).map(i => (i, "x")).toDF("k", "v"), Seq("k"), maxKeys = 10)
    }
    assert(err.getMessage.contains("bounded"), err.getMessage)
    assert(ManifestSink.snapshots(root).size == gens2)
  }

  test("MoR tombstones scope to delete-time files; CoW rewrites apply and prune them") {
    import spark.implicits._
    val root = freshRoot("mor_scope")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    // tombstone k = 2 on the only committed file
    assert(ManifestSink.deleteWhereMoR(root,
      Array(org.apache.spark.sql.sources.EqualTo("k", 2L))))
    // rows appended AFTER the delete are out of scope — k=2 reappears
    Seq((2L, "b2")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).save()
    assert(ManifestSink.readCommitted(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (3L, "c"), (2L, "b2")),
      "a tombstone must not affect post-delete appends")
    // a MERGE touching the tombstoned file applies the tombstone (the
    // old k=2 row must NOT resurrect) and prunes the dead reference
    ManifestSink.merge(spark, root,
      Seq((1L, "A1")).toDF("k", "v"), Seq("k"))
    val rows = ManifestSink.readCommitted(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "A1"), (3L, "c"), (2L, "b2")),
      s"merge must apply standing tombstones: $rows")
    // the rewritten file replaced the tombstone's only target: the
    // emptied tombstone drops from the manifest
    assert(Files.readAllLines(Paths.get(root, "manifest.json"))
      .toArray(Array.empty[String]).count(_.startsWith("#d:")) == 0,
      "an emptied tombstone must drop with its last file")
  }

  test("a new tombstone mid-feed refuses the snapshot stream loudly") {
    import spark.implicits._
    val root = freshRoot("mor_feed")
    Seq((1L, "a")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    assert(ManifestSink.deleteWhereMoR(root,
      Array(org.apache.spark.sql.sources.EqualTo("k", 1L))))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING")
    val stream = new graft.sources.ManifestSnapshotStream(root, schema, schema)
    val err = intercept[IllegalStateException] {
      stream.planInputPartitions(
        graft.sources.SnapshotOffset(1L), graft.sources.SnapshotOffset(2L))
    }
    assert(err.getMessage.contains("tombstone"), err.getMessage)
  }

  private def segRefsOf(m: java.nio.file.Path): Seq[String] =
    Files.readAllLines(m).toArray(Array.empty[String]).toSeq
      .filter(_.startsWith("#seg:")).map(_.stripPrefix("#seg:"))
      .map(_.takeWhile(_ != '|')) // drop the r17 envelope suffix

  test("append metadata cost is O(batch): one segment + a small list, prior by ref") {
    import spark.implicits._
    val root = freshRoot("seg_cost")
    val segDir = Paths.get(root, "_segments")
    def segBytes: Map[String, Long] = {
      val s = Files.list(segDir)
      try {
        val it = s.iterator(); val b = Map.newBuilder[String, Long]
        while (it.hasNext) { val p = it.next(); b += p.getFileName.toString -> Files.size(p) }
        b.result()
      } finally s.close()
    }
    // commit 1: a wide first load (8 files, 8 stats lines)
    (0L until 400L).map(i => (i, s"v$i")).toDF("k", "v").repartition(8)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    val segs1 = segBytes
    assert(segs1.size == 1, s"one commit = one segment: ${segs1.keySet}")
    val firstSegBytes = segs1.values.sum
    // commit 2: a single-row append — the metadata WRITTEN is the new
    // (tiny) segment plus the relisted refs, NOT a re-inline of the
    // first commit's 8 stats lines
    Seq((9999L, "x")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).save()
    val segs2 = segBytes
    assert(segs2.size == 2, s"append adds exactly one segment: ${segs2.keySet}")
    assert(segs2.contains(segs1.keySet.head) &&
      segs2(segs1.keySet.head) == firstSegBytes,
      "the prior segment must carry by reference, byte-identical")
    val newSegBytes = (segs2 -- segs1.keySet).values.sum
    val listBytes = Files.size(Paths.get(root, "manifest.json"))
    assert(newSegBytes + listBytes < firstSegBytes / 2,
      s"append metadata (seg $newSegBytes + list $listBytes) must be far " +
        s"below a full re-inline ($firstSegBytes)")
    // resolution is lossless: names, stats, reads all see 9 files
    assert(ManifestSink.committedFiles(root).size == 9)
    assert(ManifestSink.fileStats(root).size == 9)
    assert(ManifestSink.readCommitted(spark, root).count() == 401L)
    // recorded per-file byte sizes ride the stats lines (no plan-time
    // stat syscalls for r16 commits)
    assert(ManifestSink.fileStats(root).values.forall(_.bytes > 0L))
  }

  test("snapshots share segments by reference; vacuum expires orphans with them") {
    import spark.implicits._
    val root = freshRoot("seg_share")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    Seq((3L, "c")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).save()
    val snaps = Paths.get(root, "_snapshots")
    val refs1 = segRefsOf(snaps.resolve("manifest-1.json"))
    val refs2 = segRefsOf(snaps.resolve("manifest-2.json"))
    assert(refs1.size == 1 && refs2.size == 2 && refs2.contains(refs1.head),
      s"gen2 must reference gen1's segment, not copy it: $refs1 / $refs2")
    // compaction rewrites everything into a fresh segment…
    ManifestSink.compact(spark, root)
    val refs3 = segRefsOf(snaps.resolve("manifest-3.json"))
    assert(refs3.size == 1 && !refs2.contains(refs3.head))
    // …and a retention-1 vacuum expires gens 1-2 AND their segments
    ManifestSink.vacuum(root, retainSnapshots = 1)
    val left = {
      val s = Files.list(Paths.get(root, "_segments"))
      try {
        val it = s.iterator(); val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next().getFileName.toString
        b.result()
      } finally s.close()
    }
    assert(left.toSet == refs3.toSet,
      s"vacuum must keep exactly the retained snapshots' segments: $left")
    assert(ManifestSink.readCommitted(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // time travel to the retained generation still resolves
    assert(ManifestSink.readSnapshot(spark, root, 3L).count() == 3L)
  }

  test("segment-list consolidation bounds refs, preserves order and history") {
    import spark.implicits._
    val root = freshRoot("seg_merge")
    System.setProperty("graft.lake.maxSegRefs", "6")
    try {
      var expectedOrder = Seq.empty[String]
      (0 until 12).foreach { i =>
        Seq((i.toLong, s"v$i")).toDF("k", "v").coalesce(1)
          .write.format("graft.sources.ManifestSink")
          .mode(if (i == 0) "overwrite" else "append")
          .option("path", root).save()
        val names = ManifestSink.committedFiles(root)
          .map(f => Paths.get(f).getFileName.toString)
        // every commit APPENDS its file at the end, merge or not
        assert(names.take(expectedOrder.length) == expectedOrder,
          s"consolidation must preserve name order: $expectedOrder -> $names")
        expectedOrder = names
      }
      // the list stays bounded even though 12 commits landed
      val refs = segRefsOf(Paths.get(root, "manifest.json"))
      assert(refs.size <= 6, s"consolidation must cap refs: ${refs.size}")
      // nothing lost: all rows, all stats, exact metadata count
      assert(ManifestSink.readCommitted(spark, root).count() == 12L)
      assert(ManifestSink.fileStats(root).size == 12)
      // early snapshots (pre-merge) still resolve until vacuum
      assert(ManifestSink.readSnapshot(spark, root, 3L).count() == 3L)
      // consolidation is TRANSPARENT to the snapshot feed: the resolved
      // name delta across a merged boundary is still exactly the one
      // appended file (no false non-append refusal, no re-delivery)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, v STRING")
      val stream = new graft.sources.ManifestSnapshotStream(root, schema, schema)
      (1L until 12L).foreach { g =>
        assert(stream.planInputPartitions(
          graft.sources.SnapshotOffset(g),
          graft.sources.SnapshotOffset(g + 1)).length == 1,
          s"feed delta across gen $g must be exactly one file")
      }
      // vacuum keeps exactly the retained states' segments and reads
      // stay green after it
      ManifestSink.vacuum(root, retainSnapshots = 1)
      assert(ManifestSink.readCommitted(spark, root).count() == 12L)
    } finally System.clearProperty("graft.lake.maxSegRefs")
  }

  test("pruned DELETE rewrites only the segments holding replaced files") {
    import spark.implicits._
    val root = freshRoot("seg_del")
    // two commits -> two segments with disjoint key ranges
    (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    (50L until 100L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).save()
    val refsBefore = segRefsOf(Paths.get(root, "manifest.json"))
    assert(refsBefore.size == 2)
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.seg_del")
    spark.sql("CREATE TABLE graft_cat.lake.seg_del (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root')")
    // k >= 90 touches only the second commit's file: the first commit's
    // segment must carry BY REFERENCE (same name), the second is
    // replaced by the rewrite job's segment(s)
    spark.sql("DELETE FROM graft_cat.lake.seg_del WHERE k >= 90")
    val refsAfter = segRefsOf(Paths.get(root, "manifest.json"))
    assert(refsAfter.contains(refsBefore.head) && !refsAfter.contains(refsBefore(1)),
      s"untouched segment must carry by ref: $refsBefore -> $refsAfter")
    assert(spark.sql("SELECT k FROM graft_cat.lake.seg_del")
      .collect().map(_.getLong(0)).toSet == (0L until 90L).toSet)
    spark.sql("DROP TABLE graft_cat.lake.seg_del")
  }
}
