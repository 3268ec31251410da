package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ManifestRead, ManifestSink}

/** PARTITION-SPEC EVOLUTION (r18, VERDICT r17 Next #3): `ALTER TABLE
  * ... SET TBLPROPERTIES ('partitionBy' = ...)` re-points the write
  * spec as a metadata commit. New files land under the new spec, old
  * files keep theirs, and the scan stays honest across vintages because
  * claims are VERIFIED from per-file stats, never assumed from the
  * declared spec:
  *   - pre-evolution: KeyGrouped claims serve exchange-free rollups;
  *   - mixed vintages: claims degrade to UnknownPartitioning (results
  *     exact), while per-file envelope pruning keeps pruning EACH file
  *     under the layout it was actually written with;
  *   - compaction under the live spec migrates every file and restores
  *     the claims.
  * Other layout properties evolve through the same surface with
  * validation; path/format stay immutable.
  */
class PartitionEvolutionSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    s
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
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_psevo_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  /** k = 0..99; b = k/25 (4 coarse values), h = k/5 (20 fine values). */
  private def slice(from: Int, until: Int) = {
    import spark.implicits._
    (from until until)
      .map(k => (k.toLong / 25L, k.toLong / 5L, k.toLong)).toDF("b", "h", "k")
  }

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // finalize the adaptive plan
    SparkTestBase.collectInPlan(df.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.size
  }

  test("spec change is a metadata commit: both vintages prune under " +
      "their own layout, compaction migrates, claims return") {
    withBucketing {
      val root = freshRoot("evolve")
      spark.sql("DROP TABLE IF EXISTS graft_cat.lake.ps_t")
      spark.sql("CREATE TABLE graft_cat.lake.ps_t (b BIGINT, h BIGINT, " +
        s"k BIGINT) USING graft PARTITIONED BY (b) OPTIONS (path '$root')")
      slice(0, 100).writeTo("graft_cat.lake.ps_t").append()
      val oldFiles = ManifestSink.committedFiles(root)
        .map(f => Paths.get(f).getFileName.toString).toSet
      assert(oldFiles.size == 4, s"4 b-values -> 4 pure files: $oldFiles")
      // pre-evolution claims: rollup on b plans with no exchange
      val pre = spark.sql(
        "SELECT b, count(*) FROM graft_cat.lake.ps_t GROUP BY b")
      assert(exchanges(pre) == 0, "pre-evolution KeyGrouped claim missing")

      // the metadata commit: repartition b -> h (day -> hour shape)
      val gens0 = ManifestSink.snapshots(root).size
      spark.sql("ALTER TABLE graft_cat.lake.ps_t " +
        "SET TBLPROPERTIES ('partitionBy' = 'h')")
      // no data rewrite: same files, one evolution generation, a #ps
      // ledger line in the manifest
      assert(ManifestSink.committedFiles(root)
        .map(f => Paths.get(f).getFileName.toString).toSet == oldFiles)
      assert(ManifestSink.snapshots(root).size == gens0 + 1)
      assert(java.nio.file.Files.readAllLines(
        Paths.get(root).resolve("manifest.json"))
        .toArray(Array.empty[String]).exists(_ == "#ps:h"))

      // new rows land under the NEW spec: one pure file per h value
      slice(100, 150).writeTo("graft_cat.lake.ps_t").append()
      val newFiles = ManifestSink.committedFiles(root)
        .map(f => Paths.get(f).getFileName.toString).toSet -- oldFiles
      assert(newFiles.size == 10, s"10 new h-values -> 10 files: $newFiles")
      val stats = ManifestSink.fileStats(root)
      assert(newFiles.forall { n =>
        val h = stats(n).cols("h"); h.min == h.max && h.nulls == 0L
      }, "post-evolution files must be h-pure")

      // mixed vintages: results exact, claims honestly degrade
      val mixed = spark.sql(
        "SELECT h, count(*) AS n FROM graft_cat.lake.ps_t GROUP BY h")
      assert(exchanges(mixed) > 0,
        "mixed vintages must NOT claim KeyGrouped on h")
      assert(mixed.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
        (0 until 150).groupBy(_ / 5).map { case (h, ks) =>
          (h.toLong, ks.size.toLong) })
      // each vintage prunes under ITS OWN layout: h = 21 lives only in
      // one new file, but every old file's h-envelope may overlap —
      // pruning keeps exactly the files whose stats admit the value
      spark.sql("SELECT k FROM graft_cat.lake.ps_t WHERE h = 21").collect()
      val (keptH, totalH) = ManifestRead.lastSkipLedger.get()
      assert(totalH == 14 && keptH == 1,
        s"h=21 is a new-vintage value: kept=$keptH total=$totalH")
      spark.sql("SELECT k FROM graft_cat.lake.ps_t WHERE b = 2").collect()
      val (keptB, totalB) = ManifestRead.lastSkipLedger.get()
      // b = h/5 correlates: the old b=2 file plus the new h=10..14 files
      assert(totalB == 14 && keptB <= 6,
        s"b=2 must prune under the OLD vintage's purity: kept=$keptB")

      // compaction under the LIVE spec migrates everything
      spark.sql("CALL graft_cat.system.compact(table => 'ps_t', " +
        "partition_by => 'h', order_by => 'k')").collect()
      val migrated = ManifestSink.committedFiles(root)
        .map(f => Paths.get(f).getFileName.toString)
      assert(migrated.size == 30, s"30 h-values -> 30 pure files")
      val post = spark.sql(
        "SELECT h, count(*) AS n FROM graft_cat.lake.ps_t GROUP BY h")
      assert(exchanges(post) == 0,
        "migrated table must restore the KeyGrouped claim on h")
      assert(post.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
        (0 until 150).groupBy(_ / 5).map { case (h, ks) =>
          (h.toLong, ks.size.toLong) })
      spark.sql("SELECT k FROM graft_cat.lake.ps_t WHERE h = 3").collect()
      val (keptM, totalM) = ManifestRead.lastSkipLedger.get()
      assert(totalM == 30 && keptM == 1,
        s"migrated point query reads 1 file: kept=$keptM total=$totalM")
      spark.sql("DROP TABLE graft_cat.lake.ps_t")
    }
  }

  test("layout-property guards: validation, UNSET, and immutable keys") {
    val root = freshRoot("guards")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.ps_g")
    spark.sql("CREATE TABLE graft_cat.lake.ps_g (b BIGINT, h BIGINT, " +
      s"k BIGINT) USING graft PARTITIONED BY (b) OPTIONS (path '$root')")
    slice(0, 50).writeTo("graft_cat.lake.ps_g").append()
    // a missing column refuses
    assert(intercept[Exception](spark.sql("ALTER TABLE graft_cat.lake.ps_g " +
      "SET TBLPROPERTIES ('partitionBy' = 'nope')").collect())
      .getMessage.contains("missing column"))
    // immutable keys refuse
    assert(intercept[Exception](spark.sql("ALTER TABLE graft_cat.lake.ps_g " +
      "SET TBLPROPERTIES ('path' = '/tmp/elsewhere')").collect())
      .getMessage.contains("unsupported ALTER TABLE change"))
    // numeric knobs validate
    spark.sql("ALTER TABLE graft_cat.lake.ps_g " +
      "SET TBLPROPERTIES ('targetFileBytes' = '1048576')")
    assert(intercept[Exception](spark.sql("ALTER TABLE graft_cat.lake.ps_g " +
      "SET TBLPROPERTIES ('targetFileBytes' = 'abc')").collect())
      .getMessage.contains("positive long"))
    assert(intercept[Exception](spark.sql("ALTER TABLE graft_cat.lake.ps_g " +
      "SET TBLPROPERTIES ('deleteMode' = 'sometimes')").collect())
      .getMessage.contains("cow"))
    // UNSET partitionBy: later writes land unpartitioned (no roll)
    spark.sql("ALTER TABLE graft_cat.lake.ps_g " +
      "UNSET TBLPROPERTIES ('partitionBy')")
    val before = ManifestSink.committedFiles(root).size
    // one input partition: a still-partitioned write would roll 2 files
    // (b = 2 and 3), an unpartitioned one writes exactly 1
    slice(50, 100).coalesce(1).writeTo("graft_cat.lake.ps_g").append()
    val added = ManifestSink.committedFiles(root).size - before
    assert(added == 1, s"unpartitioned append must not roll per value " +
      s"(added $added files)")
    assert(spark.sql("SELECT count(*) FROM graft_cat.lake.ps_g")
      .head.getLong(0) == 100L)
    spark.sql("DROP TABLE graft_cat.lake.ps_g")
  }
}
