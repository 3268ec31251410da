package graft.sources

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** POSITION DELETES (VERDICT r16 Next #2, the merge-on-read half of
  * SQL row-level DML): a delta-based UPDATE / MERGE INTO on a
  * `deleteMode 'mor'` table publishes, instead of rewriting data
  * files, (a) the replacement/insert rows as ordinary appended files
  * and (b) one POSITION-DELETE FILE per writer task — a parquet file
  * of `(f: data file name, p: physical row position)` rows — plus one
  * `#pd:` manifest line naming the delete file and the data files it
  * scopes to. This is the Iceberg v2 positional-delete shape: write
  * cost is O(changed rows), ZERO existing data files rewrite, and the
  * delete metadata scales as data (distributed parquet), never as
  * manifest lines or driver memory.
  *
  * SCOPING: like predicate tombstones, a `#pd:` line lists the data
  * files committed at delta time — rows appended later (including the
  * delta's own inserts) are never affected, and positions are PHYSICAL
  * row ordinals within a file, immune to other standing deletes.
  *
  * SOUNDNESS INTERACTIONS (same sites as `#d:` predicate tombstones):
  * metadata aggregates / LIMIT / exact numRows refuse while any
  * position delete stands; the snapshot feed refuses a mid-feed
  * `#pd:`; copy-on-write rewrites and compaction APPLY standing
  * position deletes when they read and prune replaced names from
  * `#pd:` scopes (an emptied line drops — its delete file becomes a
  * vacuum-reclaimable orphan); vacuum keeps delete files referenced by
  * any retained manifest; stats skipping stays sound (removing rows
  * never widens a range). Position deletes REQUIRE a parquet payload:
  * readers count physical positions, and the rewrite helpers replay
  * them through `_metadata.row_index`, which JSON files cannot serve.
  */
object ManifestPosDeletes {

  val Prefix = "#pd:"

  /** The parquet schema of a position-delete file. */
  val DeleteSchema: StructType = StructType(Seq(
    StructField("f", StringType), StructField("p", LongType)))

  /** One published position-delete: `delFile` (under data/) holds the
    * (f, p) rows; `files` is the data-file scope.
    */
  case class PosDelete(delFile: String, files: Set[String])

  def isLine(l: String): Boolean = l.startsWith(Prefix)

  def line(pd: PosDelete): String =
    Prefix + ManifestMeta.encodeObject(Map(
      "file" -> pd.delFile,
      "files" -> pd.files.toSeq.sorted.mkString(",")))

  /** Like the predicate-tombstone parse: a damaged line fails the read
    * LOUDLY (a position delete is semantics). None only for non-`#pd:`
    * lines.
    */
  def parseLine(l: String): Option[PosDelete] =
    if (!isLine(l)) None
    else {
      val m = ManifestMeta.parse(l.stripPrefix(Prefix)).asInstanceOf[Map[String, Any]]
      Some(PosDelete(m("file").asInstanceOf[String],
        m("files").asInstanceOf[String].split(",").iterator
          .filter(_.nonEmpty).toSet))
    }

  def of(lines: Seq[String]): Seq[PosDelete] = lines.flatMap(parseLine)

  /** data file name → delete-file names that scope it. */
  def byFile(pds: Seq[PosDelete], names: Seq[String]): Map[String, Seq[String]] =
    if (pds.isEmpty) Map.empty
    else names.iterator.map { n =>
      n -> pds.filter(_.files.contains(n)).map(_.delFile)
    }.filter(_._2.nonEmpty).toMap

  /** Parsed content of one immutable delete file, cached per absolute
    * path: data file name → deleted physical positions. Bounded by
    * wholesale clear like the segment caches.
    */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, Map[String, java.util.HashSet[java.lang.Long]]]()

  def positionsOf(delPath: String): Map[String, java.util.HashSet[java.lang.Long]] = {
    val hit = cache.get(delPath)
    if (hit != null) return hit
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    val reader: ParquetReader[org.apache.parquet.example.data.Group] =
      ParquetReader.builder(new GroupReadSupport(),
        new org.apache.hadoop.fs.Path(delPath)).build()
    val acc = new java.util.HashMap[String, java.util.HashSet[java.lang.Long]]()
    try {
      var g = reader.read()
      while (g != null) {
        val f = g.getString("f", 0)
        var set = acc.get(f)
        if (set == null) { set = new java.util.HashSet(); acc.put(f, set) }
        set.add(java.lang.Long.valueOf(g.getLong("p", 0)))
        g = reader.read()
      }
    } finally reader.close()
    val parsed = {
      val b = Map.newBuilder[String, java.util.HashSet[java.lang.Long]]
      acc.forEach((k, v) => b += (k -> v))
      b.result()
    }
    if (cache.size() > 256) cache.clear()
    cache.put(delPath, parsed)
    parsed
  }

  /** Union of deleted positions for `dataFile` across its delete files
    * (FULL paths); null when none — the reader hot path tests a null,
    * not an empty set.
    */
  def positionsFor(dataFile: String,
      delPaths: Seq[String]): java.util.HashSet[java.lang.Long] = {
    if (delPaths.isEmpty) return null
    val out = new java.util.HashSet[java.lang.Long]()
    delPaths.foreach { d =>
      val s = positionsOf(d).getOrElse(dataFile, null)
      if (s != null) out.addAll(s)
    }
    if (out.isEmpty) null else out
  }
}
