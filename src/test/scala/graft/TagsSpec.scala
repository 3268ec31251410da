package graft

import java.nio.file.Paths

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestSink

/** SNAPSHOT TAGS (r19, VERDICT r18 Next #4): named refs to snapshot
  * generations in a `_refs.json` sidecar. Pinned here:
  *   - `CALL system.tag` anchors a generation; vacuum at any retention
  *     keeps the tagged snapshot AND its data files readable;
  *   - `VERSION AS OF 'name'` resolves tags through the catalog;
  *   - `drop_tag` releases the anchor and the next vacuum expires it;
  *   - misuse refuses loudly: all-digit names, unknown generations,
  *     silently re-pointing a live tag;
  *   - the `$tags` metadata table and `tags` procedure list the refs.
  */
class TagsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    s
  }

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_tags_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

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

  test("a tag anchors its snapshot through vacuum; VERSION AS OF " +
      "resolves it; drop_tag releases it") {
    import spark.implicits._
    val root = build("tags_t", "anchor")
    val gCut = ManifestSink.snapshots(root).last
    val row = spark.sql("CALL graft_cat.system.tag(table => 'tags_t', " +
      "name => 'training-cut')").head
    assert(row.getString(0) == "training-cut" && row.getLong(1) == gCut)
    // two more generations: an append, then a replace-shaped DELETE
    (100 until 120).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root)
      .option("format", "parquet").save()
    spark.sql("DELETE FROM graft_cat.lake.tags_t WHERE k >= 110")
    // retention 1 would normally keep only the live snapshot — the tag
    // must pin gCut AND its data files
    spark.sql("CALL graft_cat.system.vacuum(table => 'tags_t', " +
      "retain_snapshots => 1)").collect()
    val gens = ManifestSink.snapshots(root)
    assert(gens.contains(gCut), s"tagged generation expired: $gens")
    assert(!gens.contains(gCut + 1),
      s"untagged intermediate generation must expire: $gens")
    // the tagged snapshot reads exactly — through SQL time travel by NAME
    val asOf = spark.sql(
      "SELECT count(*) c, sum(k) s FROM graft_cat.lake.tags_t " +
        "VERSION AS OF 'training-cut'").head
    assert(asOf.getLong(0) == 100L && asOf.getLong(1) == (0L until 100L).sum)
    // live state unaffected
    assert(spark.sql("SELECT count(*) FROM graft_cat.lake.tags_t")
      .head.getLong(0) == 110L)
    // the refs surface: procedure + metadata table agree
    val listed = spark.sql("CALL graft_cat.system.tags(table => 'tags_t')")
      .collect()
    assert(listed.length == 1 && listed.head.getString(0) == "training-cut" &&
      listed.head.getLong(1) == gCut && !listed.head.isNullAt(2))
    assert(spark.sql("SELECT name, generation FROM " +
      "graft_cat.lake.`tags_t$tags`").head.toSeq ==
      Seq("training-cut", gCut))
    // drop the anchor: the next vacuum expires generation and files
    assert(spark.sql("CALL graft_cat.system.drop_tag(table => 'tags_t', " +
      "name => 'training-cut')").head.getBoolean(0))
    spark.sql("CALL graft_cat.system.vacuum(table => 'tags_t', " +
      "retain_snapshots => 1)").collect()
    assert(!ManifestSink.snapshots(root).contains(gCut))
    assert(intercept[Exception](spark.sql(
      "SELECT * FROM graft_cat.lake.tags_t VERSION AS OF 'training-cut'")
      .collect()).getMessage.contains("refs:"))
    // dropping again reports absence
    assert(!spark.sql("CALL graft_cat.system.drop_tag(table => 'tags_t', " +
      "name => 'training-cut')").head.getBoolean(0))
  }

  test("tag misuse refuses loudly; re-tagging the same gen is idempotent") {
    val root = build("tags_g", "guard")
    val g = ManifestSink.snapshots(root).last
    assert(ManifestSink.tag(root, "cut") == g)
    // idempotent on the same (name, gen)
    assert(ManifestSink.tag(root, "cut", Some(g)) == g)
    // silently re-pointing refuses
    import spark.implicits._
    (100 until 110).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).option("format", "parquet").save()
    val g2 = ManifestSink.snapshots(root).last
    assert(intercept[IllegalArgumentException](
      ManifestSink.tag(root, "cut", Some(g2)))
      .getMessage.contains("drop_tag"))
    // all-digit names collide with generation resolution
    assert(intercept[IllegalArgumentException](
      ManifestSink.tag(root, "123")).getMessage.contains("all digits"))
    // unknown generation
    assert(intercept[Exception](ManifestSink.tag(root, "ghost", Some(999L)))
      .getMessage.contains("does not exist"))
    // bad characters
    assert(intercept[IllegalArgumentException](
      ManifestSink.tag(root, "a b")).getMessage.contains("A-Za-z0-9"))
  }

  test("rollback republishes a retained main snapshot as the new live " +
      "state; history is preserved and misuse refuses loudly") {
    import spark.implicits._
    val root = build("rb_t", "rollback") // keys 0..99
    spark.sql("CALL graft_cat.system.tag(table => 'rb_t', name => 'good')")
    // two commits past the good state: an append and a DELETE
    (100 until 120).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).option("format", "parquet").save()
    spark.sql("DELETE FROM graft_cat.lake.rb_t WHERE k < 10")
    val preRb = ManifestSink.snapshots(root).last
    assert(spark.sql("SELECT count(*) FROM graft_cat.lake.rb_t")
      .head.getLong(0) == 110L)
    // rollback by tag: the live state becomes the tagged state, as a
    // NEW generation (never a re-point of the old number)
    val newGen = spark.sql("CALL graft_cat.system.rollback(" +
      "table => 'rb_t', tag => 'good')").head.getLong(0)
    assert(newGen > preRb)
    assert(spark.sql("SELECT count(*), sum(k) FROM graft_cat.lake.rb_t")
      .head.toSeq == Seq(100L, (0L until 100L).sum))
    // HISTORY PRESERVED: the rolled-past head still time-travels
    assert(spark.sql("SELECT count(*) FROM graft_cat.lake.rb_t " +
      s"VERSION AS OF $preRb").head.getLong(0) == 110L)
    // rolling back to the live generation is an idempotent no-op
    val again = spark.sql("CALL graft_cat.system.rollback(" +
      s"table => 'rb_t', generation => $newGen)").head.getLong(0)
    assert(again == newGen && ManifestSink.snapshots(root).last == newGen)
    // misuse: unknown generation names the retained ones; argument
    // cardinality is exactly one of generation/tag
    assert(intercept[Exception](spark.sql("CALL graft_cat.system.rollback(" +
      "table => 'rb_t', generation => 9999)").collect())
      .getMessage.contains("retained"))
    assert(intercept[Exception](spark.sql("CALL graft_cat.system.rollback(" +
      "table => 'rb_t')").collect())
      .getMessage.contains("exactly one"))
    assert(intercept[Exception](spark.sql("CALL graft_cat.system.rollback(" +
      s"table => 'rb_t', generation => $newGen, tag => 'good')").collect())
      .getMessage.contains("exactly one"))
    // a BRANCH commit is not main lineage: rollback routes the operator
    // to fast_forward instead of silently publishing branch state
    spark.sql("CALL graft_cat.system.branch(table => 'rb_t', name => 'wip')")
    (200 until 210).map(k => (k.toLong, s"w$k")).toDF("k", "v")
      .coalesce(1).write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).option("branch", "wip")
      .option("format", "parquet").save()
    val branchGen = ManifestSink.snapshots(root).last
    assert(intercept[Exception](spark.sql("CALL graft_cat.system.rollback(" +
      s"table => 'rb_t', generation => $branchGen)").collect())
      .getMessage.contains("fast_forward"))
    // SCHEMA GUARD: rolling back past a schema evolution would
    // un-evolve the live schema and resurrect a cleared rename ledger
    // — refused loudly; data state stays readable via VERSION AS OF
    spark.sql("ALTER TABLE graft_cat.lake.rb_t RENAME COLUMN v TO v2")
    assert(intercept[Exception](spark.sql("CALL graft_cat.system.rollback(" +
      s"table => 'rb_t', generation => $newGen)").collect())
      .getMessage.contains("schema"))
  }
}
