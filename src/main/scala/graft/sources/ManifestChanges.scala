package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CHANGE-DATA FEED (VERDICT r16 Next #4, the Delta CDF shape,
  * batch-first): [[readChanges]] derives a row-level change log
  * between two snapshot generations from the manifest history alone —
  * no change files are ever written. Each returned row carries
  * `_change_type` ('insert' | 'delete') and `_commit_gen` (the
  * generation that produced it), so a consumer that cannot use the
  * append-only snapshot stream (which refuses on rewrites and MoR
  * deletes by design) can reconstruct any state:
  *
  *   state(toGen) = state(fromGen) ⊎ inserts − deletes   (multisets)
  *
  * Per adjacent generation window (g, g']:
  *   - files ADDED by g' emit their rows as inserts (read with the
  *     deletes applicable AT g' — a delta commit's position deletes
  *     scope pre-commit files only, so its inserts are clean);
  *   - files REMOVED by g' emit their g-visible rows as deletes
  *     (a compaction therefore emits delete+insert pairs that cancel
  *     in the reconstruction);
  *   - deletes NEW in g' on carried files (predicate tombstones,
  *     position deletes) emit exactly the rows they killed — computed
  *     PER FILE: rows visible at g whose new predicate is TRUE or
  *     whose physical position is newly deleted.
  *
  * Scale shape: each window reads only the files its commit touched
  * (added, removed, or newly delete-scoped); nothing is ever diffed
  * row-wise against the full table.
  */
object ManifestChanges {

  def readChanges(spark: SparkSession, root: String, fromGen: Long,
      toGen: Long): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val rootP = Paths.get(root)
    val retained = ManifestSink.snapshots(root)
    require(fromGen == 0L || retained.contains(fromGen),
      s"generation $fromGen of $root is not retained — " +
        s"available: ${retained.mkString(",")}")
    // toGen must be addressable too, or an expired bound would silently
    // truncate the feed to whatever happens to be retained (code-review
    // r17); retention expires a PREFIX, so validated endpoints imply no
    // interior gaps
    require(toGen == fromGen || retained.contains(toGen),
      s"generation $toGen of $root is not retained — " +
        s"available: ${retained.mkString(",")}")
    val gens = retained.filter(g => g > fromGen && g <= toGen)

    def linesAt(g: Long): Seq[String] =
      if (g == 0L) Seq.empty
      else ManifestSink.resolvedManifestLines(rootP,
        rootP.resolve("_snapshots").resolve(s"manifest-$g.json"))
        .getOrElse(throw new IllegalArgumentException(
          s"snapshot $g of $root expired — retain more generations " +
            "or start the change read from a retained one"))

    // toGen's schema reads every window (older files resolve by name;
    // columns they predate read null — same rule as the live scan)
    val schemaGen = gens.lastOption.getOrElse(retained.lastOption.getOrElse(0L))
    require(schemaGen > 0L, s"no retained snapshots at $root")
    val schema = StructType.fromDDL(linesAt(schemaGen).head)
    // evolution ledger at the feed's schema vintage: prior-named cells
    // and pre-rename tombstone references resolve into that schema's
    // column space (names are never reused, so the cumulative map is
    // correct for every older window too)
    val evoTail = linesAt(schemaGen).tail
    val p2c = ManifestEvolution.priorToCurrent(evoTail)
    val aliases = ManifestEvolution.currentToPriors(evoTail)
    def remapped(tail: Seq[String], names: Seq[String]) =
      ManifestDeletes.byFile(ManifestDeletes.of(tail).map(t =>
        t.copy(filter = ManifestEvolution.remapFilter(t.filter, p2c))), names)

    def dataPath(n: String): String = rootP.resolve("data").resolve(n).toString
    def withType(df: DataFrame, t: String, g: Long): DataFrame =
      df.select((schema.fieldNames.map(col) :+
        lit(t).as("_change_type") :+ lit(g).as("_commit_gen")).toIndexedSeq: _*)

    var prevLines = linesAt(fromGen)
    val parts = Seq.newBuilder[DataFrame]
    gens.foreach { g =>
      val curLines = linesAt(g)
      val prevTail = if (prevLines.isEmpty) Seq.empty[String] else prevLines.tail
      val curTail = curLines.tail
      val prevNames = prevTail.filterNot(_.startsWith("#"))
      val curNames = curTail.filterNot(_.startsWith("#"))
      val added = (curNames.toSet -- prevNames).toSeq.sorted
      val removed = (prevNames.toSet -- curNames).toSeq.sorted
      val carried = prevNames.filter(curNames.toSet)

      val prevDel = remapped(prevTail, prevNames)
      val curDel = remapped(curTail, curNames)
      val prevPos = ManifestSink.posDeletesOf(rootP, prevTail)
      val curPos = ManifestSink.posDeletesOf(rootP, curTail)

      // INSERTS: the added files' rows as visible at g
      if (added.nonEmpty)
        parts += withType(ManifestSink.readDataFiles(spark, schema,
          added.map(dataPath), curDel, curPos, aliases), "insert", g)
      // DELETES (a): removed files' rows as visible at the window start
      if (removed.nonEmpty)
        parts += withType(ManifestSink.readDataFiles(spark, schema,
          removed.map(dataPath), prevDel, prevPos, aliases), "delete", g)

      // DELETES (b), PER FILE: carried files with deletes new in g emit
      // the rows those deletes killed
      carried.foreach { n =>
        val newPreds = (curDel.getOrElse(n, Seq.empty).toSet --
          prevDel.getOrElse(n, Seq.empty)).toSeq
        val newPos = (curPos.getOrElse(n, Seq.empty).toSet --
          prevPos.getOrElse(n, Seq.empty)).toSeq.sorted
        if (newPreds.nonEmpty || newPos.nonEmpty) {
          val predCond = newPreds.map(p =>
            ManifestSink.filterToColumn(p).getOrElse(
              throw new IllegalStateException(
                s"untranslatable tombstone predicate $p in change feed")))
            .reduceOption(_ || _)
          val killed: DataFrame =
            if (newPos.isEmpty) {
              // predicate-only: killed = old-visible rows where the new
              // predicate is TRUE (SQL delete semantics)
              val oldVis = ManifestSink.readDataFiles(spark, schema,
                Seq(dataPath(n)),
                prevDel.view.filterKeys(_ == n).toMap,
                prevPos.view.filterKeys(_ == n).toMap, aliases)
              oldVis.filter(coalesce(predCond.get, lit(false)))
            } else {
              // positional (parquet-only payload by construction): one
              // provenance read; killed = newly-deleted position OR new
              // predicate TRUE, deduped per PHYSICAL row
              val twins = schema.fields.flatMap(f =>
                aliases.getOrElse(f.name, Seq.empty).map(pn =>
                  org.apache.spark.sql.types.StructField(pn, f.dataType,
                    nullable = true)))
              val raw0 = spark.read
                .schema(if (twins.isEmpty) schema
                        else StructType(schema.fields ++ twins))
                .parquet(dataPath(n))
                .withColumn("__p", col("_metadata.row_index"))
              val raw =
                if (twins.isEmpty) raw0
                else raw0.select((schema.fields.toIndexedSeq.map { f =>
                  val chain = aliases.getOrElse(f.name, Seq.empty)
                  if (chain.isEmpty) col(f.name)
                  else coalesce((f.name +: chain).map(col): _*).as(f.name)
                } :+ col("__p")): _*)
              val oldVis = {
                val pv = prevPos.getOrElse(n, Seq.empty)
                val base = if (pv.isEmpty) raw else {
                  val pd = spark.read.schema(ManifestPosDeletes.DeleteSchema)
                    .parquet(pv: _*).filter(col("f") === lit(n))
                    .withColumnRenamed("p", "__pp")
                  raw.join(pd, raw("__p") === pd("__pp"), "left_anti")
                }
                val pc = prevDel.getOrElse(n, Seq.empty).map(p =>
                  ManifestSink.filterToColumn(p).getOrElse(
                    throw new IllegalStateException(
                      s"untranslatable tombstone predicate $p in change feed")))
                  .reduceOption(_ || _)
                pc match {
                  case Some(c) => base.filter(coalesce(
                    org.apache.spark.sql.functions.not(c), lit(true)))
                  case None => base
                }
              }
              val nd = spark.read.schema(ManifestPosDeletes.DeleteSchema)
                .parquet(newPos: _*).filter(col("f") === lit(n))
                .withColumnRenamed("p", "__dp")
              val byPos = oldVis.join(nd, oldVis("__p") === nd("__dp"),
                "left_semi")
              val both = predCond match {
                case Some(c) => byPos.unionByName(
                  oldVis.filter(coalesce(c, lit(false))))
                  .dropDuplicates("__p") // one physical row = one delete
                case None => byPos
              }
              both.drop("__p")
            }
          parts += withType(killed, "delete", g)
        }
      }
      prevLines = curLines
    }
    val out = parts.result()
    if (out.isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      withType(empty, "insert", toGen).limit(0)
    } else out.reduce(_.unionByName(_))
  }
}
