package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Lake maintenance hardening (r19): the abandoned-staging sweep and
  * the generation high-water mark.
  *
  *   - `remove_orphans` deletes staging files a crashed writer left
  *     (and stray `.tmp` metadata leftovers) past an age threshold —
  *     and ONLY those: committed data, segments, snapshots and refs
  *     are never candidates, and young staging files (a write in
  *     flight right now) survive;
  *   - `_gen.hw` pins that generation numbers are never reassigned
  *     even if retention deletes the globally newest snapshot files —
  *     today vacuum's count window happens to keep them, the mark
  *     makes the stability an invariant.
  */
class LakeMaintenanceSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    s
  }

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_maint_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  private def build(name: String, tag: String): String = {
    import spark.implicits._
    val root = freshRoot(tag)
    (0 until 50).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet").save()
    spark.sql(s"DROP TABLE IF EXISTS graft_cat.lake.$name")
    spark.sql(s"CREATE TABLE graft_cat.lake.$name (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root', format 'parquet')")
    root
  }

  test("remove_orphans deletes only aged staging/.tmp residue; committed " +
      "state and young staging survive") {
    val root = build("maint_t", "orph")
    val rootP = Paths.get(root)
    val staging = rootP.resolve("_staging")
    Files.createDirectories(staging)
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 48L * 3600 * 1000)
    // a crashed writer's leftover (old) and an in-flight write (young)
    Files.write(staging.resolve("dead-writer.parquet"), Array[Byte](1, 2))
    Files.setLastModifiedTime(staging.resolve("dead-writer.parquet"), old)
    Files.write(staging.resolve("inflight.parquet"), Array[Byte](3))
    // a stray interrupted-swap leftover at the root
    Files.write(rootP.resolve("manifest.json.tmp"), Array[Byte](4))
    Files.setLastModifiedTime(rootP.resolve("manifest.json.tmp"), old)
    val deleted = spark.sql(
      "CALL graft_cat.system.remove_orphans(table => 'maint_t')")
      .head().getLong(0)
    assert(deleted == 2L, s"expected the 2 aged orphans deleted, got $deleted")
    assert(!Files.exists(staging.resolve("dead-writer.parquet")))
    assert(Files.exists(staging.resolve("inflight.parquet")),
      "a young staging file (write in flight) must survive")
    assert(!Files.exists(rootP.resolve("manifest.json.tmp")))
    // committed state untouched and readable
    assert(spark.table("graft_cat.lake.maint_t").count() === 50L)
    // older_than_ms => 0 sweeps the young one too
    def residue(): Seq[String] = {
      def ls(d: java.nio.file.Path) =
        if (!Files.exists(d)) Seq.empty
        else {
          val s = Files.list(d)
          try {
            val b = Seq.newBuilder[String]
            s.iterator().forEachRemaining(p => b += p.toString)
            b.result()
          } finally s.close()
        }
      ls(staging) ++ (ls(rootP) ++ ls(rootP.resolve("_snapshots")) ++
        ls(rootP.resolve("_segments"))).filter(_.endsWith(".tmp"))
    }
    // the residue at this point is `inflight` plus the Hadoop `.crc`
    // checksum sidecar the committed write's staged parquet left behind
    // (the data file MOVES to data/ at commit; its sidecar does not) —
    // a real leak this sweep exists for
    val before2 = residue()
    assert(before2.exists(_.endsWith("inflight.parquet")), before2.toString)
    val d2 = spark.sql("CALL graft_cat.system.remove_orphans(" +
      "table => 'maint_t', older_than_ms => 0)").head().getLong(0)
    assert(d2 == before2.size,
      s"expected all ${before2.size} residue files deleted, got $d2: $before2")
    assert(!Files.exists(staging.resolve("inflight.parquet")))
    // idempotent
    assert(spark.sql("CALL graft_cat.system.remove_orphans(" +
      "table => 'maint_t', older_than_ms => 0)").head().getLong(0) == 0L)
  }

  test("generation numbers are never reassigned, even if retention " +
      "deletes the newest snapshot files") {
    import spark.implicits._
    val root = build("maint_hw", "hw")
    (50 until 60).map(k => (k.toLong, s"v$k")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).option("format", "parquet").save()
    val gens = ManifestSink.snapshots(root)
    assert(gens == Seq(1L, 2L))
    // simulate a future/external retention deleting the NEWEST snapshot
    // manifest (today's vacuum never does — this pins the invariant,
    // not the current policy)
    Files.delete(Paths.get(root).resolve("_snapshots").resolve("manifest-2.json"))
    assert(ManifestSink.snapshots(root) == Seq(1L))
    (60 until 70).map(k => (k.toLong, s"v$k")).toDF("k", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).option("format", "parquet").save()
    // the high-water mark forbids recycling generation 2
    assert(ManifestSink.snapshots(root) == Seq(1L, 3L),
      "an expired generation number must never be reassigned")
    assert(ManifestSink.liveGen(root) == 3L)
  }
}
