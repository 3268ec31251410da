package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestSink

/** The sink's exactly-once claims, pinned where they are observable:
  * a reader that goes through the manifest can never see uncommitted
  * staging data, a re-run replaces (not appends) the published table,
  * and the round trip is value-exact through the schema-generic
  * serializer including JSON-hostile strings.
  */
class ManifestSinkSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def freshRoot(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_manifest_spec_$tag")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
    p.toString
  }

  test("round trip is value-exact, including escapes, nulls, and doubles") {
    import spark.implicits._
    val root = freshRoot("roundtrip")
    val src = Seq(
      (1L, "plain", 1.5, "x"),
      (2L, "quote\"back\\slash", -0.25, null),
      (3L, "tab\tnew\nline", 0.0, "y")
    ).toDF("k", "s", "d", "opt")
    src.write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    val back = spark.read.schema(src.schema)
      .json(ManifestSink.committedFiles(root): _*)
    assert(back.collect().map(_.toSeq).toSet == src.collect().map(_.toSeq).toSet)
  }

  test("orphaned staging files are invisible; re-run replaces the table") {
    import spark.implicits._
    val root = freshRoot("orphan")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    // simulate a task that staged data but never committed (crash /
    // speculation loser): the file exists but no manifest mentions it
    Files.write(Paths.get(root).resolve("_staging").resolve("part-99999-999.json"),
      "{\"k\":999,\"v\":\"GHOST\"}\n".getBytes)
    val schema = Seq((1L, "a")).toDF("k", "v").schema
    val back1 = spark.read.schema(schema)
      .json(ManifestSink.committedFiles(root): _*).collect()
    assert(back1.length == 2 && !back1.exists(_.getLong(0) == 999L),
      "uncommitted staging data leaked into a manifest read")
    // second job: last-writer-wins — the manifest swap must REPLACE the
    // visible file set, not accumulate the first run's files
    Seq((10L, "z")).toDF("k", "v")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    val back2 = spark.read.schema(schema)
      .json(ManifestSink.committedFiles(root): _*).collect()
    assert(back2.map(_.getLong(0)).toSet == Set(10L),
      s"re-run must replace the published table: ${back2.mkString(",")}")
  }

  test("compaction: atomic republish, reader isolation until vacuum, idempotent") {
    import spark.implicits._
    val root = freshRoot("compact")
    val src = (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v")
    src.repartition(4).write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    val preFiles = ManifestSink.committedFiles(root)
    assert(preFiles.size == 4, s"expected 4 committed parts: $preFiles")

    ManifestSink.compact(spark, root)
    val postFiles = ManifestSink.committedFiles(root)
    assert(postFiles.size == 1, s"compaction must publish one file: $postFiles")

    // READER ISOLATION: vacuum has not run — a reader that snapshotted
    // the PRE-compaction manifest still reads its full generation, and
    // the new manifest reads the same rows
    assert(preFiles.forall(f => Files.exists(Paths.get(f))),
      "pre-compaction files must survive until vacuum")
    val schema = src.schema
    val oldGen = spark.read.schema(schema).json(preFiles: _*)
      .collect().map(_.getLong(0)).toSet
    val newGen = ManifestSink.readCommitted(spark, root)
      .collect().map(_.getLong(0)).toSet
    assert(oldGen == (1L to 200L).toSet && newGen == oldGen,
      "compaction must be row-exact across both generations")

    // IDEMPOTENT: a second compact is a no-op (manifest byte-identical)
    val manifestBefore = Files.readAllBytes(Paths.get(root, "manifest.json")).toSeq
    ManifestSink.compact(spark, root)
    assert(Files.readAllBytes(Paths.get(root, "manifest.json")).toSeq == manifestBefore,
      "re-running compaction on a compact table must change nothing")

    // VACUUM: removes exactly the orphaned generation, then nothing
    assert(ManifestSink.vacuum(root) == 4)
    assert(preFiles.forall(f => !Files.exists(Paths.get(f))))
    assert(ManifestSink.vacuum(root) == 0, "vacuum must be idempotent")
    assert(ManifestSink.readCommitted(spark, root)
      .collect().map(_.getLong(0)).toSet == (1L to 200L).toSet)
  }

  test("requested write distribution/ordering: cluster-pure, internally sorted files") {
    import spark.implicits._
    val root = freshRoot("clustered")
    val src = (1L to 300L).map(i => (i, s"g${i % 5}", i * 7 % 1000))
      .toDF("k", "grp", "v")
    // deliberately scrambled input: the SINK's declared layout, not the
    // input order, must determine the file contents
    src.repartition(7).write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root)
      .option("clusterBy", "grp").option("orderBy", "k").save()
    val files = ManifestSink.committedFiles(root)
    val schema = src.schema
    // each grp lands WHOLLY in one file (clustered distribution)...
    val grpFiles = files.flatMap { f =>
      spark.read.schema(schema).json(f).select("grp").distinct()
        .collect().map(_.getString(0) -> f)
    }
    val byGrp = grpFiles.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(byGrp.size == 5 && byGrp.values.forall(_.size == 1),
      s"each cluster key must land in exactly one file: $byGrp")
    // ...and within each file rows are sorted by (grp, k)
    files.foreach { f =>
      val rows = spark.read.schema(schema).json(f)
        .select("grp", "k").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(rows.sameElements(rows.sortBy(identity)),
        s"file $f not internally sorted by (grp, k)")
    }
    // layout changed nothing about the data
    assert(ManifestSink.readCommitted(spark, root).collect().map(_.toSeq).toSet
      == src.collect().map(_.toSeq).toSet)
  }

  test("snapshots: as-of reads survive overwrite; retention vacuum expires safely") {
    import spark.implicits._
    val root = freshRoot("snapshot")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    val g1FileCount = ManifestSink.committedFiles(root).size
    Seq((10L, "z")).toDF("k", "v")
      .write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).save()
    val Seq(g1, g2) = ManifestSink.snapshots(root)
    // the overwrite replaced the LIVE table, but the as-of read of g1
    // still sees the first generation in full
    assert(ManifestSink.readSnapshot(spark, root, g1)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(ManifestSink.readSnapshot(spark, root, g2)
      .collect().map(_.getLong(0)).toSet == Set(10L))
    assert(ManifestSink.readCommitted(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(10L))
    // retention 2: nothing deletable (both generations protected)
    assert(ManifestSink.vacuum(root, retainSnapshots = 2) == 0)
    assert(ManifestSink.snapshots(root) == Seq(g1, g2))
    // retention 1: g1 expires FIRST, then its files go — a time-travel
    // reader can never resolve a snapshot to deleted files
    assert(ManifestSink.vacuum(root, retainSnapshots = 1) == g1FileCount)
    assert(ManifestSink.snapshots(root) == Seq(g2))
    intercept[IllegalArgumentException] {
      ManifestSink.readSnapshot(spark, root, g1)
    }
    assert(ManifestSink.readCommitted(spark, root)
      .collect().map(_.getLong(0)).toSet == Set(10L))
    assert(ManifestSink.vacuum(root, retainSnapshots = 1) == 0)
  }

  test("manifest is written last: no manifest, nothing visible") {
    val root = freshRoot("nopub")
    // stage a file by hand with no commit ever happening
    Files.createDirectories(Paths.get(root).resolve("_staging"))
    Files.write(Paths.get(root).resolve("_staging").resolve("part-0-0.json"),
      "{\"k\":1}\n".getBytes)
    assert(ManifestSink.committedFiles(root).isEmpty,
      "a never-committed job must publish nothing")
  }
}
