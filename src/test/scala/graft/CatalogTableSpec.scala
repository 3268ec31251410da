package graft
// (rename coverage added r16 at the end of the suite)

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestSink

/** The v2 TableCatalog's load-bearing claims: identifier resolution
  * carries the connectors' full capability surface (pushdown reaches the
  * generator through plain SQL; column pruning reaches the manifest
  * scan), INSERT INTO appends while INSERT OVERWRITE truncates, and the
  * catalog-resolved read path round-trips JSON-hostile values.
  */
class CatalogTableSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    s
  }

  private def freshRoot(tag: String): String = {
    val p = java.nio.file.Paths.get(s"/tmp/graft_catalog_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  test("synth virtual table: SQL identifier carries the pushdown surface") {
    val df = spark.sql(
      "SELECT sum(amount_cents) AS s FROM graft_cat.synth.r10000_s4 " +
        "WHERE id >= 2000 AND id < 3000")
    // the filter AND the global aggregate both reach the GENERATOR:
    // the catalog-resolved plan routes to the aggregate-pushdown scan
    // with the tightened range
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("SynthAggScan")).getOrElse("")
    assert(scanLine.contains("range=[2000, 3000)"),
      s"catalog-resolved filter+agg must push into the source:\n$scanLine")
    assert(df.collect().head.getLong(0) ==
      (2000L until 3000L).map(graft.sources.SynthDataSource.amountCents).sum)
    // malformed identifiers fail resolution cleanly
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_cat.synth.nonsense").collect()
    }
  }

  test("lake DDL+DML: INSERT INTO appends, INSERT OVERWRITE truncates") {
    val root = freshRoot("dml")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spec_t")
    spark.sql("CREATE TABLE graft_cat.lake.spec_t (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root')")
    spark.sql("INSERT INTO graft_cat.lake.spec_t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft_cat.lake.spec_t VALUES (3, 'tab\\there')")
    assert(spark.sql("SELECT k FROM graft_cat.lake.spec_t")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // each INSERT INTO committed a snapshot
    assert(ManifestSink.snapshots(root).size == 2)
    // the JSON-hostile string round-trips through the connector reader
    assert(spark.sql("SELECT v FROM graft_cat.lake.spec_t WHERE k = 3")
      .collect().head.getString(0) == "tab\there")
    // OVERWRITE truncates to just the new rows
    spark.sql("INSERT OVERWRITE graft_cat.lake.spec_t VALUES (9, 'z')")
    assert(spark.sql("SELECT k, v FROM graft_cat.lake.spec_t")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((9L, "z")))
    // column pruning reaches the manifest scan
    val pruned = spark.sql("SELECT v FROM graft_cat.lake.spec_t")
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ManifestScan")).getOrElse("")
    assert(scanLine.contains("cols=v") && !scanLine.contains("cols=k"),
      s"pruned read must reach the scan:\n$scanLine")
    spark.sql("DROP TABLE graft_cat.lake.spec_t")
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_cat.lake.spec_t").collect()
    }
  }

  test("DELETE FROM: distributed rewrite, pre-delete snapshot survives, clean refusal") {
    val root = freshRoot("delete")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spec_d")
    spark.sql("CREATE TABLE graft_cat.lake.spec_d (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root')")
    spark.sql("INSERT INTO graft_cat.lake.spec_d VALUES " +
      "(1,'a'),(2,'b'),(3,'c'),(4,'d'),(5,'e')")
    spark.sql("DELETE FROM graft_cat.lake.spec_d WHERE k > 3")
    assert(spark.sql("SELECT k FROM graft_cat.lake.spec_d")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // the delete is a new snapshot; the pre-delete generation is still
    // time-travel readable until a retention vacuum expires it
    val gens = ManifestSink.snapshots(root)
    assert(gens.size == 2)
    assert(ManifestSink.readSnapshot(spark, root, gens.head)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 5L))
    // a predicate outside the metadata-translatable subset no longer
    // refuses (pre-r17 behavior): it routes through the group-based
    // row-level COPY-ON-WRITE rewrite (SupportsRowLevelOperations) and
    // deletes exactly — never a wrong partial delete either way
    spark.sql("DELETE FROM graft_cat.lake.spec_d WHERE k % 2 = 0")
    assert(spark.sql("SELECT k FROM graft_cat.lake.spec_d")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L),
      "the group-routed delete must apply the untranslatable predicate exactly")
    spark.sql("DROP TABLE graft_cat.lake.spec_d")
  }

  test("re-attach with fewer/renamed columns: unknown file keys are skipped") {
    val root = freshRoot("reattach")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spec_r")
    spark.sql("CREATE TABLE graft_cat.lake.spec_r (k BIGINT, n BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root')")
    spark.sql("INSERT INTO graft_cat.lake.spec_r VALUES (1, 10, 'a'), (2, 20, 'b')")
    spark.sql("DROP TABLE graft_cat.lake.spec_r")
    // re-create over the same path declaring FEWER columns: committed
    // files still carry `n` (numeric) and `v` — the reader must skip the
    // unknown keys by name, not crash on the numeric one (ADVICE r14)
    spark.sql("CREATE TABLE graft_cat.lake.spec_r (k BIGINT, missing BIGINT) " +
      s"USING graft OPTIONS (path '$root')")
    val rows = spark.sql("SELECT k, missing FROM graft_cat.lake.spec_r")
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).toSet
    assert(rows == Set((1L, true), (2L, true)),
      "unknown file keys must be skipped; absent schema columns read null")
    spark.sql("DROP TABLE graft_cat.lake.spec_r")
  }

  test("DELETE keeps rows whose predicate is UNKNOWN (null column values)") {
    val root = freshRoot("delnull")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spec_dn")
    spark.sql("CREATE TABLE graft_cat.lake.spec_dn (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root')")
    spark.sql("INSERT INTO graft_cat.lake.spec_dn VALUES " +
      "(1,'x'),(2,NULL),(3,'y'),(4,NULL)")
    // SQL DELETE semantics: WHERE v = 'x' is UNKNOWN on null rows — they
    // must be KEPT, not swept up with the matches (ADVICE r14)
    spark.sql("DELETE FROM graft_cat.lake.spec_dn WHERE v = 'x'")
    assert(spark.sql("SELECT k FROM graft_cat.lake.spec_dn")
      .collect().map(_.getLong(0)).toSet == Set(2L, 3L, 4L),
      "rows with a NULL predicate value must survive the delete")
    // IS NULL, by contrast, deletes exactly the null rows
    spark.sql("DELETE FROM graft_cat.lake.spec_dn WHERE v IS NULL")
    assert(spark.sql("SELECT k FROM graft_cat.lake.spec_dn")
      .collect().map(_.getLong(0)).toSet == Set(3L))
    spark.sql("DROP TABLE graft_cat.lake.spec_dn")
  }

  test("ALTER TABLE ADD COLUMN is metadata-only; old snapshots keep their shape") {
    val root = freshRoot("evo")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spec_e")
    spark.sql("CREATE TABLE graft_cat.lake.spec_e (k BIGINT) " +
      s"USING graft OPTIONS (path '$root')")
    spark.sql("INSERT INTO graft_cat.lake.spec_e VALUES (1), (2)")
    val filesBefore = ManifestSink.committedFiles(root).toSet
    spark.sql("ALTER TABLE graft_cat.lake.spec_e ADD COLUMN v STRING")
    // metadata-only: no file was rewritten by the ALTER
    assert(ManifestSink.committedFiles(root).toSet == filesBefore)
    spark.sql("INSERT INTO graft_cat.lake.spec_e VALUES (3, 'c')")
    val rows = spark.sql("SELECT k, v FROM graft_cat.lake.spec_e")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, null), (2L, null), (3L, "c")))
    // the pre-ALTER snapshot still reads with its OWN schema
    val gens = ManifestSink.snapshots(root)
    assert(ManifestSink.readSnapshot(spark, root, gens.head)
      .schema.fieldNames.toSeq == Seq("k"))
    // DROP COLUMN is supported since r17 (metadata-only, name reserved
    // until a rewrite) — full coverage lives in SchemaEvolutionSpec
    spark.sql("ALTER TABLE graft_cat.lake.spec_e DROP COLUMN v")
    assert(spark.sql("SELECT * FROM graft_cat.lake.spec_e")
      .columns.toSeq == Seq("k"))
    spark.sql("DROP TABLE graft_cat.lake.spec_e")
  }

  test("copy-on-write merge: replace by key, insert new keys, survivors exact") {
    import spark.implicits._
    val root = freshRoot("merge")
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    ManifestSink.merge(spark,
      root, Seq((2L, 99L), (9L, 90L)).toDF("k", "v"), Seq("k"))
    val rows = ManifestSink.readCommitted(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 10L), (2L, 99L), (3L, 30L), (9L, 90L)))
    // the merge is a snapshot: the pre-merge state survives until vacuum
    val gens = ManifestSink.snapshots(root)
    assert(ManifestSink.readSnapshot(spark, root, gens.head)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("nulls survive the catalog write/read cycle") {
    val root = freshRoot("nulls")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.spec_n")
    spark.sql("CREATE TABLE graft_cat.lake.spec_n (k BIGINT, v STRING, d DOUBLE) " +
      s"USING graft OPTIONS (path '$root')")
    spark.sql("INSERT INTO graft_cat.lake.spec_n VALUES " +
      "(1, NULL, 1.5), (2, 'x', NULL), (NULL, 'y', -0.25)")
    val rows = spark.sql(
        "SELECT k, v, d FROM graft_cat.lake.spec_n")
      .collect().map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        r.getString(1), if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(rows == Set((1L, null, 1.5), (2L, "x", null), (null, "y", -0.25)))
    spark.sql("DROP TABLE graft_cat.lake.spec_n")
  }

  test("ALTER TABLE RENAME is metadata-only; refusals are loud") {
    val root = freshRoot("rename")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.rn_old")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.rn_new")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.rn_other")
    spark.sql("CREATE TABLE graft_cat.lake.rn_old (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root')")
    spark.sql("INSERT INTO graft_cat.lake.rn_old VALUES (1, 'a'), (2, 'b')")
    val filesBefore = ManifestSink.committedFiles(root)
    spark.sql("ALTER TABLE graft_cat.lake.rn_old RENAME TO lake.rn_new")
    // data untouched, new name reads it, old name is gone
    assert(ManifestSink.committedFiles(root) == filesBefore)
    assert(spark.sql("SELECT k FROM graft_cat.lake.rn_new")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(intercept[Exception](spark.sql("SELECT * FROM graft_cat.lake.rn_old"))
      .getMessage.toLowerCase.contains("rn_old"))
    // renaming onto an existing table refuses
    spark.sql("CREATE TABLE graft_cat.lake.rn_other (k BIGINT) " +
      s"USING graft OPTIONS (path '${freshRoot("rename2")}')")
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE graft_cat.lake.rn_other RENAME TO lake.rn_new")
    }.getMessage.toLowerCase.contains("rn_new"))
    spark.sql("DROP TABLE graft_cat.lake.rn_new")
    spark.sql("DROP TABLE graft_cat.lake.rn_other")
  }
}
