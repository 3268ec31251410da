package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions.{col, count, lit, sum, when}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ManifestChanges, ManifestSink}

/** CDF-lite (VERDICT r16 Next #4): readChanges derives insert/delete
  * rows from snapshot diffs + predicate tombstones + position deletes,
  * so maintenance (compaction, MoR DML) no longer forces change
  * consumers to restart — the reconstruction invariant is
  * state(to) = state(from) + inserts − deletes as multisets.
  */
class ChangesFeedSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
    s
  }

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_cdf_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  /** Multiset reconstruction from a change log: net-positive rows. */
  private def reconstruct(changes: org.apache.spark.sql.DataFrame,
      cols: Seq[String]): Set[Seq[Any]] =
    changes.groupBy(cols.map(col): _*)
      .agg(sum(when(col("_change_type") === "insert", 1L)
        .otherwise(-1L)).as("net"))
      .filter(col("net") > 0L)
      .collect().map(r => cols.indices.map(r.get)).toSet

  private def state(root: String, cols: Seq[String]): Set[Seq[Any]] =
    ManifestSink.readCommitted(spark, root)
      .select(cols.map(col): _*)
      .collect().map(r => cols.indices.map(r.get)).toSet

  test("append-only history replays as pure inserts") {
    import spark.implicits._
    val root = freshRoot("appends")
    (0 until 3).foreach { i =>
      (i * 10 until (i + 1) * 10).map(k => (k.toLong, s"v$k")).toDF("k", "v")
        .coalesce(1).write.format("graft.sources.ManifestSink")
        .mode(if (i == 0) "overwrite" else "append")
        .option("path", root).save()
    }
    val top = ManifestSink.snapshots(root).last
    val ch = ManifestChanges.readChanges(spark, root, 0L, top)
    assert(ch.filter(col("_change_type") === "delete").count() == 0L)
    assert(reconstruct(ch, Seq("k", "v")) == state(root, Seq("k", "v")))
    // a sub-window replays only its own commits
    val mid = ManifestSink.snapshots(root)(1)
    val sub = ManifestChanges.readChanges(spark, root, mid, top)
    assert(sub.count() == 10L)
    assert(sub.agg(org.apache.spark.sql.functions.min(col("k")))
      .collect().head.getLong(0) == 20L)
  }

  test("MoR DML + predicate DELETE + compaction reconstruct exactly") {
    import spark.implicits._
    val root = freshRoot("full")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.cdf_full")
    (0L until 200L).map(i => (i, i % 7L, s"v$i")).toDF("k", "x", "v")
      .repartition(3)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet").save()
    spark.sql("CREATE TABLE graft_cat.lake.cdf_full (k BIGINT, x BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root', format 'parquet', deleteMode 'mor')")
    // delta UPDATE: position deletes + inserted replacements
    spark.sql("UPDATE graft_cat.lake.cdf_full SET v = 'upd' WHERE x = 3")
    // predicate-tombstone DELETE
    spark.sql("DELETE FROM graft_cat.lake.cdf_full WHERE x = 5")
    // compaction: rewrites files (delete+insert pairs must net out)
    ManifestSink.compact(spark, root)
    // one more append after maintenance
    Seq((1000L, 0L, "late")).toDF("k", "x", "v").coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root).option("format", "parquet").save()

    val top = ManifestSink.snapshots(root).last
    val ch = ManifestChanges.readChanges(spark, root, 0L, top)
    assert(reconstruct(ch, Seq("k", "x", "v")) == state(root, Seq("k", "x", "v")))
    // and an incremental window starting mid-history also reconstructs
    // when seeded with the starting state
    val gens = ManifestSink.snapshots(root)
    val from = gens(1) // after the UPDATE
    val seed = ManifestSink.readSnapshot(spark, root, from)
      .select(col("k"), col("x"), col("v"))
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_gen", lit(0L))
    val inc = ManifestChanges.readChanges(spark, root, from, top)
    assert(reconstruct(seed.unionByName(inc), Seq("k", "x", "v")) ==
      state(root, Seq("k", "x", "v")))
  }

  test("rollback past MoR deletes emits the resurrected rows — revived " +
      "windows reconstruct exactly (r19 rollback)") {
    import spark.implicits._
    val root = freshRoot("rollback")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.cdf_rb")
    (0L until 100L).map(i => (i, i % 5L, s"v$i")).toDF("k", "x", "v")
      .repartition(2)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet").save()
    spark.sql("CREATE TABLE graft_cat.lake.cdf_rb " +
      "(k BIGINT, x BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root', format 'parquet', " +
      "deleteMode 'mor')")
    val good = ManifestSink.snapshots(root).last
    // two bad commits in MoR: a position-delete UPDATE and a
    // predicate-tombstone DELETE — then roll both back. The rollback
    // window is the one shape where deletes DISAPPEAR from carried
    // files without any rewrite: both revived flavors (dropped
    // position files, dropped predicates) must emit inserts
    spark.sql("UPDATE graft_cat.lake.cdf_rb SET v = 'bad' WHERE x = 2")
    spark.sql("DELETE FROM graft_cat.lake.cdf_rb WHERE x = 4")
    val preRb = ManifestSink.snapshots(root).last
    val newGen = ManifestSink.rollback(root, good)
    val win = ManifestChanges.readChanges(spark, root, preRb, newGen)
    // the x=4 rows died by tombstone and the x=2 originals by position
    // delete: both resurrect as inserts in the rollback window
    assert(win.filter(col("_change_type") === "insert" &&
      col("x") === 4L).count() == 20L)
    assert(win.filter(col("_change_type") === "insert" &&
      col("x") === 2L && col("v") =!= "bad").count() == 20L)
    // full-history reconstruction nets to the live (= rolled-back) state
    val ch = ManifestChanges.readChanges(spark, root, 0L, newGen)
    assert(reconstruct(ch, Seq("k", "x", "v")) ==
      state(root, Seq("k", "x", "v")))
    // and the incremental window seeded with the pre-rollback state
    // lands on the rolled-back state too
    val seed = ManifestSink.readSnapshot(spark, root, preRb)
      .select(col("k"), col("x"), col("v"))
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_gen", lit(0L))
    assert(reconstruct(seed.unionByName(win), Seq("k", "x", "v")) ==
      state(root, Seq("k", "x", "v")))
  }

  test("duplicate rows keep multiset semantics through position deletes") {
    import spark.implicits._
    val root = freshRoot("dups")
    spark.sql("DROP TABLE IF EXISTS graft_cat.lake.cdf_dups")
    // 4 identical copies of each key — value identity is NOT row identity
    (0L until 20L).flatMap(k => Seq.fill(4)((k, "same"))).toDF("k", "v")
      .coalesce(1)
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("format", "parquet").save()
    spark.sql("CREATE TABLE graft_cat.lake.cdf_dups (k BIGINT, v STRING) " +
      s"USING graft OPTIONS (path '$root', format 'parquet', deleteMode 'mor')")
    spark.sql("UPDATE graft_cat.lake.cdf_dups SET v = 'u' WHERE k = 7")
    val top = ManifestSink.snapshots(root).last
    val ch = ManifestChanges.readChanges(spark, root, 0L, top)
    // 4 physical rows deleted, 4 inserted
    assert(ch.filter(col("_change_type") === "delete").count() == 4L)
    val net = ch.groupBy(col("k"), col("v"))
      .agg(sum(when(col("_change_type") === "insert", 1L).otherwise(-1L))
        .as("net")).filter(col("net") > 0L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val live = ManifestSink.readCommitted(spark, root)
      .groupBy(col("k"), col("v")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(net == live, s"multiset drift: $net vs $live")
  }

  test("a 100-commit replay keeps bounded plan depth (VERDICT r17 Next #5)") {
    import spark.implicits._
    val root = freshRoot("depth")
    (0 until 100).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("k", "v")
        .coalesce(1).write.format("graft.sources.ManifestSink")
        .mode(if (i == 0) "overwrite" else "append")
        .option("path", root).option("format", "parquet").save()
    }
    val top = ManifestSink.snapshots(root).last
    val ch = ManifestChanges.readChanges(spark, root, 0L, top)
    // unbatched, 100 windows union 100 scan subtrees (300+ plan nodes);
    // the batched construction checkpoints every UnionBatch frames into
    // one leaf, so the final plan is a flat union of ~7 LogicalRDDs —
    // pinned below a constant that the unbatched shape cannot meet
    val nodes = ch.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(nodes < 60, s"long-range readChanges plan has $nodes nodes")
    // and the replay itself is still exact
    assert(ch.count() == 100L)
    assert(ch.filter(col("_change_type") === "delete").count() == 0L)
    assert(reconstruct(ch, Seq("k", "v")) == state(root, Seq("k", "v")))
    // the checkpointed construction preserves per-commit attribution
    assert(ch.select("_commit_gen").distinct().count() == 100L)
  }

  test("an expired from-generation refuses loudly") {
    import spark.implicits._
    val root = freshRoot("expired")
    (0 until 3).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("k", "v").coalesce(1)
        .write.format("graft.sources.ManifestSink")
        .mode(if (i == 0) "overwrite" else "append")
        .option("path", root).save()
    }
    ManifestSink.vacuum(root, retainSnapshots = 1)
    val top = ManifestSink.snapshots(root).last
    val err = intercept[IllegalArgumentException] {
      ManifestChanges.readChanges(spark, root, 1L, top)
    }
    assert(err.getMessage.contains("not retained"))
    // the TO bound refuses too — an expired toGen must never silently
    // truncate the feed (code-review r17)
    val err2 = intercept[IllegalArgumentException] {
      ManifestChanges.readChanges(spark, root, 0L, 1L)
    }
    assert(err2.getMessage.contains("not retained"))
  }
}
