package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A custom DSv2 SINK with a real two-phase COMMIT PROTOCOL — the write
  * side of the connector tier (the reference's BigQuery sink re-expressed
  * as first-class Spark write semantics): every task writes to a private
  * STAGING file, task commit returns the staged path as its
  * `WriterCommitMessage`, and only the DRIVER's `BatchWrite.commit`
  * publishes — moving staged files into `data/` and writing
  * `manifest.json` (the file list + schema) LAST, so readers that go
  * through the manifest can never observe a partial job:
  *
  *   - a task that never commits leaves only an orphaned staging file
  *     the manifest never mentions (invisible — spec-pinned);
  *   - `BatchWrite.abort` deletes the staged files;
  *   - re-running a job replaces the manifest atomically (write to temp
  *     + `ATOMIC_MOVE`), giving last-writer-wins table semantics.
  *
  * This is exactly the commit dance every exactly-once lake sink
  * (FileStreamSink's log, Iceberg/Delta snapshots) performs, scaled
  * down to a JSON-lines payload so the whole protocol stays inspectable.
  * Rows serialize schema-generically (long/int/double/string), and
  * read-back is standard `spark.read.json` over the manifest's file
  * list ([[ManifestSink.committedFiles]]) — the registry row
  * `q_dsv2_sink` round-trips the nation dim through it and scores
  * against the parquet source directly.
  */
class ManifestSink extends TableProvider {
  // writes carry the query's schema (passed straight to getTable); only
  // a schemaless READ needs the manifest for inference.
  //
  // CONCURRENCY CONTRACT (single writer, snapshot readers): the manifest
  // swap is atomic, so any ONE read of manifest.json observes a complete
  // committed job — but schema inference here and a later
  // committedFiles() call are two separate reads, and a concurrent
  // re-run landing between them can pair the old schema with the new
  // file list. Readers that must be re-run-safe should take ONE
  // manifest snapshot ([[ManifestSink.readCommitted]]) instead of
  // inferSchema + committedFiles; the registry harness is
  // single-process single-writer, where the two-read path is safe.
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // the schema is the manifest's FIRST line — reading it alone keeps
    // schema inference O(1) instead of resolving every segment (r17)
    val m = Paths.get(options.get("path")).resolve("manifest.json")
    if (!Files.exists(m)) throw new IllegalArgumentException(
      s"no manifest at ${options.get("path")} — write before reading")
    val r = Files.newBufferedReader(m, StandardCharsets.UTF_8)
    try StructType.fromDDL(r.readLine())
    finally r.close()
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    def cols(key: String): Seq[String] = Option(properties.get(key))
      .map(_.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    new ManifestTable(properties.get("path"), schema,
      Option(properties.get("carryEpochs"))
        .map(_.split(",").iterator.map(_.trim).filter(_.nonEmpty)
          .map(_.toLong).toSet)
        .getOrElse(Set.empty),
      cols("clusterBy"), cols("orderBy"),
      // partition entries may be transform specs with parens — a plain
      // comma split would cut bucket(8,id) in half (r19)
      partitionBy = Option(properties.get("partitionBy"))
        .map(PartitionTransforms.splitSpecs).getOrElse(Seq.empty),
      format = Option(properties.get("format")).getOrElse("json"),
      replaceFiles = cols("replaceFiles"),
      zorderClaim = cols("zorderClaim"),
      sortedClaim = cols("sortedClaim"),
      layoutProvided = "true".equalsIgnoreCase(
        String.valueOf(properties.get("layoutProvided"))),
      expectedGen = Option(properties.get("expectedGen")).map(_.toLong),
      deleteMode = Option(properties.get("deleteMode")).getOrElse("cow"),
      tombstoneFilter = Option(properties.get("tombstoneFilter")),
      bloomFor = cols("bloomFor"),
      targetFileBytes = Option(properties.get("targetFileBytes"))
        .map(_.toLong).getOrElse(0L),
      rowGroupBytes = Option(properties.get("rowGroupBytes"))
        .map(_.toLong).getOrElse(0L),
      splitConf = SplitConf(
        Option(properties.get("targetSplitBytes")).map(_.toLong)
          .getOrElse(SplitConf.DefaultTargetBytes),
        Option(properties.get("openCostBytes")).map(_.toLong)
          .getOrElse(SplitConf.DefaultOpenCostBytes)))
  }
}

/** Read-side task sizing: files bin-pack into partitions of
  * ~`targetBytes`, each file costing at least `openCostBytes` (the
  * task-setup floor that stops a million tiny files from becoming a
  * million tasks) — the same two dials as Spark's own
  * `files.maxPartitionBytes` / `files.openCostInBytes`.
  */
case class SplitConf(targetBytes: Long, openCostBytes: Long)
object SplitConf {
  val DefaultTargetBytes: Long = 128L * 1024 * 1024
  val DefaultOpenCostBytes: Long = 4L * 1024 * 1024
  val Default: SplitConf = SplitConf(DefaultTargetBytes, DefaultOpenCostBytes)
}

object ManifestSink {
  // ---------------------------------------------------------------
  // SHARDED MANIFEST METADATA (VERDICT r15 Next #1 — the Iceberg
  // manifest-file + manifest-list shape, scaled to this codebase):
  // `manifest.json` is a small LIST — schema DDL, `#seg:<name>` lines
  // referencing immutable per-commit SEGMENT files under `_segments/`
  // (each holding that commit's file names + `#s:` stats lines), plus
  // the `#e:`/`#t:` ledger. An APPEND writes one new segment and a
  // new list (O(batch), not O(table)); unchanged segments carry BY
  // REFERENCE across snapshots (a snapshot archives only the list);
  // DELETE/MERGE rewrite only the segments holding replaced files;
  // compaction merges everything into one fresh segment. Readers
  // RESOLVE refs through a driver-side cache — segments are immutable
  // (unique per-job names, atomic move), so a 1M-file table's metadata
  // parses once per process, not once per query. Pre-segment manifests
  // (inline file names/stats) resolve unchanged — both shapes coexist.
  // ---------------------------------------------------------------

  // shared with vacuum and the commit path — a drifting literal here
  // would silently empty vacuum's keep-set and delete live segments
  // (code-review r16)
  private[sources] val SegPrefix = "#seg:"

  /** A `#seg:` ref line is `#seg:<name>[|<envelope-json>]` — the
    * optional suffix is the segment's per-column min/max ENVELOPE plus
    * file count (VERDICT r16 Next #1), letting the scan planner refute
    * whole segments from the LIST alone. Every parse site resolves the
    * NAME through this helper (a `|`-blind stripPrefix would treat the
    * envelope as part of the file name and break resolution, vacuum's
    * keep-set, and rewrites).
    */
  private[sources] def segRefName(l: String): String = {
    val body = l.stripPrefix(SegPrefix)
    val i = body.indexOf('|')
    if (i < 0) body else body.substring(0, i)
  }

  /** (file count, envelope stats) of a ref line, when present and
    * parseable. A damaged envelope degrades to None — the segment then
    * always resolves, exactly like a pre-envelope ref; pruning is an
    * optimization tier, resolution is the semantics.
    */
  private[sources] def segRefSummary(l: String): Option[(Long, ManifestMeta.FileStats)] = {
    val body = l.stripPrefix(SegPrefix)
    val i = body.indexOf('|')
    if (i < 0) None
    else try {
      val m = ManifestMeta.parse(body.substring(i + 1))
        .asInstanceOf[Map[String, Any]]
      Some((m("files").asInstanceOf[Long], ManifestMeta.fileStatsFrom(m)))
    } catch { case _: Exception => None }
  }

  /** Per-root commit mutual exclusion (VERDICT r15 Next #4), two
    * layers: an in-process monitor serializes same-JVM writers, and —
    * inside it — an advisory `_commit.lock` FileChannel lock extends
    * the exclusion across PROCESSES on filesystems that honor POSIX
    * advisory locks (local disks, NFSv4). The commit's whole
    * read-modify-publish (prior list read → segment write → manifest
    * swap) runs under both, so interleaving between read and swap is
    * impossible wherever the lock is honored; the generation CAS in
    * commit() remains the conflict DETECTOR for replace-shaped commits
    * planned against a stale snapshot (the Iceberg-catalog CAS role),
    * and the atomic manifest rename keeps readers tear-free even on
    * filesystems where advisory locks are a no-op.
    */
  private val commitLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(root: Path): Object =
    commitLocks.computeIfAbsent(root.toAbsolutePath.toString, _ => new Object)

  private[sources] def withCommitLock[T](root: Path)(body: => T): T =
    // monitor FIRST: the JVM throws OverlappingFileLockException if one
    // process re-locks the same file region, so in-process exclusion
    // must already hold before the channel lock is attempted
    lockFor(root).synchronized {
      Files.createDirectories(root)
      val ch = java.nio.channels.FileChannel.open(root.resolve("_commit.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val fl = ch.lock() // blocks until any other process releases
        try body
        finally fl.release()
      } finally ch.close()
    }

  /** Bounded re-plan-and-retry for REPLACE-SHAPED operations that lose
    * the optimistic-concurrency CAS to an interleaved commit (VERDICT
    * r16 Next #7): the thunk must RE-PLAN on every invocation — every
    * engine helper does (compact / merge / mergeMoR / deleteWhere all
    * re-read the live snapshot at entry), so
    * `withCommitRetry() { ManifestSink.compact(spark, root) }` is the
    * whole operational loop. Only a CAS loss
    * (ConcurrentModificationException anywhere in the cause chain)
    * retries; every other failure — and the final CAS loss past
    * `maxAttempts` — rethrows untouched. Serializable-equivalent by
    * construction: each attempt plans against the then-current
    * snapshot, so the winning attempt is a clean serial execution
    * after the interleaved commits.
    */
  def withCommitRetry[T](maxAttempts: Int = 3)(op: => T): T = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 0
    while (true) {
      attempt += 1
      try return op
      catch {
        case e: Throwable =>
          // depth-bounded cause walk: a cyclic cause chain (initCause
          // misuse in wrapping layers) must rethrow, not spin
          // (code-review r17)
          var cause: Throwable = e
          var depth = 0
          while (cause.getCause != null && (cause.getCause ne cause) &&
            depth < 50 &&
            !cause.isInstanceOf[java.util.ConcurrentModificationException]) {
            cause = cause.getCause
            depth += 1
          }
          if (!cause.isInstanceOf[java.util.ConcurrentModificationException] ||
              attempt >= maxAttempts) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Immutable-segment cache: parsed lines per absolute segment path.
    * Bounded by wholesale clear (stale keys from vacuumed tables are
    * harmless but must not accumulate forever).
    */
  private val segCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()

  /** Spec ledger: segment RESOLUTIONS attempted (cache hits included) —
    * how the pruning spec pins that a selective scan never touches the
    * segments its envelope refuted.
    */
  private[sources] val segResolves = new java.util.concurrent.atomic.AtomicLong(0L)

  private[sources] def segmentLines(root: Path, name: String): Seq[String] = {
    segResolves.incrementAndGet()
    val p = root.resolve("_segments").resolve(name)
    val key = p.toString
    val hit = segCache.get(key)
    if (hit != null) return hit
    val lines = Files.readAllLines(p).toArray(Array.empty[String]).toSeq
    if (segCache.size() > 4096) segCache.clear()
    segCache.put(key, lines)
    lines
  }

  /** Parsed view of one immutable segment: (file names in order, stats
    * by name). Cached separately from the raw lines — the scan planner
    * re-reads segments every build(), and re-parsing the stats JSON per
    * query was the residual O(files-touched) driver cost.
    */
  private val segDataCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[String], Map[String, ManifestMeta.FileStats])]()

  private[sources] def segmentData(root: Path, name: String):
      (Seq[String], Map[String, ManifestMeta.FileStats]) = {
    val key = root.resolve("_segments").resolve(name).toString
    val hit = segDataCache.get(key)
    if (hit != null) { segResolves.incrementAndGet(); return hit }
    val lines = segmentLines(root, name)
    val parsed = (lines.filterNot(_.startsWith("#")), ManifestMeta.statsOf(lines))
    if (segDataCache.size() > 1024) segDataCache.clear()
    segDataCache.put(key, parsed)
    parsed
  }

  /** Expand `#seg:` references of a manifest's line list in place —
    * the one resolution point every reader shares. Inline lines pass
    * through untouched (pre-segment manifests, ledger lines).
    */
  private[sources] def resolveLines(root: Path, lines: Seq[String]): Seq[String] =
    if (!lines.exists(_.startsWith(SegPrefix))) lines
    else lines.flatMap { l =>
      if (l.startsWith(SegPrefix)) segmentLines(root, segRefName(l))
      else Seq(l)
    }

  /** Fully resolved lines (DDL head + expanded tail) of a manifest
    * file, or None if absent.
    */
  private[sources] def resolvedManifestLines(root: Path, m: Path): Option[Seq[String]] =
    if (!Files.exists(m)) None
    else {
      val raw = Files.readAllLines(m).toArray(Array.empty[String]).toSeq
      Some(raw.head +: resolveLines(root, raw.tail))
    }

  /** The RAW (unresolved) list tail of the live manifest — what commit
    * paths carry forward so unchanged segments republish by reference.
    */
  private[sources] def rawListLines(root: Path): Seq[String] =
    rawListLinesAt(root.resolve("manifest.json"))

  /** The RAW (unresolved) list tail of an arbitrary manifest file — a
    * BRANCH commit carries forward its branch HEAD's archived snapshot,
    * not `manifest.json` (r19). An absent file reads as the empty table
    * (legitimate for a first write); callers for whom absence means
    * DAMAGE (a branch head, which vacuum anchors) must check existence
    * and refuse loudly first — an empty prior would silently truncate.
    */
  private[sources] def rawListLinesAt(m: Path): Seq[String] =
    if (!Files.exists(m)) Seq.empty
    else Files.readAllLines(m).toArray(Array.empty[String]).toSeq.drop(1)

  /** SEGMENT-LIST CONSOLIDATION: a long-lived streaming table commits
    * one segment per epoch, so the manifest LIST itself grows O(commits)
    * and a cold driver parse reads one small file per historical commit.
    * When a commit would publish more than `maxSegRefs` refs
    * (-Dgraft.lake.maxSegRefs, default 64), the OLDEST run of refs
    * merges into one consolidated segment — metadata-only (reads the
    * merged segments' lines, writes one file; data files untouched),
    * resolved line order preserved exactly, and the recent tail of
    * small segments is kept so snapshot-feed deltas stay cheap. Old
    * snapshots keep referencing the pre-merge segments until vacuum
    * expires them — the same reuse rule as every other segment.
    */
  private def maxSegRefs: Int = Integer.getInteger("graft.lake.maxSegRefs", 64)

  private[sources] def consolidateRefs(root: Path, tail: Seq[String],
      token: String): Seq[String] = {
    val refIdx = tail.zipWithIndex
      .filter(_._1.startsWith(SegPrefix)).map(_._2)
    val cap = maxSegRefs
    if (refIdx.length <= cap) return tail
    val keepTail = math.max(4, cap / 4)
    val mergeIdx = refIdx.dropRight(keepTail)
    if (mergeIdx.length < 2) return tail
    val lo = mergeIdx.head
    val hi = mergeIdx.last
    // name ORDER is semantics (LIMIT prefix, bin packing): merging is
    // only safe when no bare file-name line sits inside the merged span
    // (ledger `#` lines are position-insensitive) — otherwise names
    // would reorder across the span. Mixed pre-segment manifests that
    // fail this simply skip consolidation.
    if (tail.slice(lo, hi + 1).exists(l => !l.startsWith("#"))) return tail
    val merged = mergeIdx.flatMap(i =>
      segmentLines(root, segRefName(tail(i))))
    val mergedRef = writeSegment(root, token, merged)
    val mergeSet = mergeIdx.toSet
    tail.zipWithIndex.flatMap { case (l, i) =>
      if (i == lo) Seq(mergedRef)
      else if (mergeSet.contains(i)) Seq.empty
      else Seq(l)
    }
  }

  /** Stage + atomically publish one immutable segment holding this
    * commit's file names and stats lines; returns its `#seg:` ref line.
    * `token` is run-unique (every caller includes a per-run random
    * component), so segment names never collide — and IMMUTABILITY IS
    * ENFORCED (ADVICE r16): an existing segment file is REFUSED, never
    * replaced, because retained `_snapshots/` manifests may still
    * reference it (a silent overwrite would corrupt time travel, the
    * snapshot feed, and vacuum's keep-set) and the same-JVM segCache
    * may have served its old content. The cache is warmed with the new
    * segment's lines, so a commit's own readback never re-reads it.
    */
  private[sources] def writeSegment(root: Path, token: String,
      lines: Seq[String]): String = {
    val segs = root.resolve("_segments")
    Files.createDirectories(segs)
    val name = s"seg-$token.json"
    val target = segs.resolve(name)
    if (Files.exists(target)) throw new IllegalStateException(
      s"segment $name already exists under $segs — segments are immutable; " +
        "a colliding name means a token-uniqueness bug, never an overwrite")
    val tmp = segs.resolve(s"$name.tmp")
    Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    // no REPLACE_EXISTING: a racing writer of the same name fails loudly
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    segCache.put(target.toString, lines)
    // SEGMENT ENVELOPE (VERDICT r16 Next #1): fold this segment's
    // per-file stats into a summary riding the ref line itself, so a
    // selective plan refutes the whole segment from the LIST without
    // resolving it. Emitted only when EVERY file carries stats (the
    // envelope also certifies stats-completeness to the metadata-agg
    // tier); anything surprising degrades to a bare ref — pruning is
    // an optimization, resolution stays the semantics. Consolidation
    // re-derives merged envelopes for free (it goes through here).
    val names = lines.filterNot(_.startsWith("#"))
    val stats = ManifestMeta.statsOf(lines)
    val envSuffix =
      if (names.nonEmpty && names.forall(stats.contains))
        try "|" + ManifestMeta.encodeObject(
          ManifestMeta.statsBody(ManifestMeta.envelope(names.map(stats))) +
            ("files" -> names.length.toLong))
        catch { case _: Exception => "" }
      else ""
    s"$SegPrefix$name$envSuffix"
  }

  /** (committed file names, their stats) from ONE live-manifest
    * resolution — the row-level operations' shared read (code-review
    * r17: each op was resolving the manifest 2-3 times for the
    * parquet-require / bloom / layout derivations).
    */
  private[sources] def committedState(root: Path):
      (Seq[String], Map[String, ManifestMeta.FileStats]) =
    resolvedManifestLines(root, root.resolve("manifest.json")) match {
      case None => (Seq.empty, Map.empty)
      case Some(lines) =>
        val p2c = ManifestEvolution.priorToCurrent(lines.tail)
        (lines.tail.filterNot(_.startsWith("#")),
          ManifestMeta.statsOf(lines.tail).map { case (n, fs) =>
            n -> ManifestEvolution.remapStats(fs, p2c) })
    }

  /** Raw manifest lines: (schema DDL, committed file NAMES). One read =
    * one consistent snapshot (the manifest swap is atomic; segments are
    * immutable, so resolution can never tear).
    */
  private[sources] def rawManifest(root: Path): Option[(String, Seq[String])] =
    resolvedManifestLines(root, root.resolve("manifest.json")).map { lines =>
      // `#`-prefixed lines are ledger annotations (carried epoch ids
      // after a compaction, stats, commit instants), never data files
      (lines.head, lines.tail.filterNot(_.startsWith("#")))
    }

  /** Ledger annotation lines (`#e:<epoch>`, `#s:` stats) of the live
    * manifest, segments resolved — how a compacted manifest keeps its
    * epoch history after the epoch-prefixed file names are rewritten.
    */
  private[sources] def ledgerLines(root: Path): Seq[String] =
    resolvedManifestLines(root, root.resolve("manifest.json"))
      .map(_.tail.filter(_.startsWith("#"))).getOrElse(Seq.empty)

  /** Per-file stats (`#s:` lines) of the live manifest, keyed by bare
    * file name — the zone-map tier [[ManifestMeta]] evaluates skipping
    * against. Files without a stats line simply aren't in the map (and
    * are never skipped).
    */
  def fileStats(root: String): Map[String, ManifestMeta.FileStats] = {
    val ledger = ledgerLines(Paths.get(root))
    // stats were written under then-current names: remap into the live
    // column space so purity/bloom/layout/key-bound consumers keep
    // working across renames (r17 evolution)
    val p2c = ManifestEvolution.priorToCurrent(ledger)
    ManifestMeta.statsOf(ledger).map { case (n, fs) =>
      n -> ManifestEvolution.remapStats(fs, p2c) }
  }

  /** Read a specific committed file set (absolute paths), dispatching
    * per file on payload format — `.parquet` files go through Spark's
    * vectorized parquet reader, everything else through the JSON-lines
    * reader. A manifest table may legitimately hold BOTH (a format
    * switch mid-history rewrites nothing).
    */
  /** RENAMED COLUMNS (r17 evolution), the shared resolution for every
    * Spark-native by-name read: a live name absent from a pre-rename
    * file would read null, so the read schema widens with PRIOR-NAMED
    * TWINS ([[aliasReadSchema]]) and each aliased column coalesces over
    * its chain ([[aliasResolved]]) — a file holds at most ONE name of a
    * chain (reuse is refused), so coalesce picks the stored cell.
    * `extras` carries provenance columns (`__f`/`__p`) through the
    * projection untouched.
    */
  private[sources] def aliasReadSchema(schema: StructType,
      aliases: Map[String, Seq[String]]): StructType = {
    val twins = schema.fields.flatMap(f =>
      aliases.getOrElse(f.name, Seq.empty).map(p =>
        org.apache.spark.sql.types.StructField(p, f.dataType, nullable = true)))
    if (twins.isEmpty) schema else StructType(schema.fields ++ twins)
  }

  private[sources] def aliasResolved(df: org.apache.spark.sql.DataFrame,
      schema: StructType, aliases: Map[String, Seq[String]],
      extras: Seq[String] = Seq.empty): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col}
    if (schema.fields.forall(f => aliases.getOrElse(f.name, Seq.empty).isEmpty))
      return df
    df.select((schema.fields.toIndexedSeq.map { f =>
      val chain = aliases.getOrElse(f.name, Seq.empty)
      if (chain.isEmpty) col(f.name)
      else coalesce((f.name +: chain).map(col): _*).as(f.name)
    } ++ extras.map(col)): _*)
  }

  private[sources] def readDataFiles(spark: org.apache.spark.sql.SparkSession,
      schema: StructType, files: Seq[String],
      aliases: Map[String, Seq[String]] = Map.empty): org.apache.spark.sql.DataFrame = {
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val readSchema = aliasReadSchema(schema, aliases)
    val (pq, js) = files.partition(_.endsWith(".parquet"))
    val parts = Seq(
      if (pq.nonEmpty)
        Some(aliasResolved(spark.read.schema(readSchema).parquet(pq: _*),
          schema, aliases))
      else None,
      if (js.nonEmpty)
        Some(aliasResolved(spark.read.schema(readSchema).json(js: _*),
          schema, aliases))
      else None
    ).flatten
    parts.reduce(_.unionByName(_))
  }

  /** Delete-aware + POSITION-aware read (r17): files scoped by a
    * position delete read with `_metadata.file_name`/`row_index` and
    * anti-join against the delete files' (f, p) rows — fully
    * distributed, the same physical-position contract as the connector
    * readers. Predicate tombstones on those files compose via a
    * per-file OR condition. Requires a parquet payload for affected
    * files (JSON has no row index — the delta operation refuses
    * non-parquet tables before one can exist).
    */
  private[sources] def readDataFiles(spark: org.apache.spark.sql.SparkSession,
      schema: StructType, files: Seq[String],
      deletes: Map[String, Seq[org.apache.spark.sql.sources.Filter]],
      posDels: Map[String, Seq[String]],
      aliases: Map[String, Seq[String]]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    if (posDels.isEmpty) return readDataFiles(spark, schema, files, deletes, aliases)
    def nameOf(f: String): String = Paths.get(f).getFileName.toString
    val (aff, clean) = files.partition(f => posDels.contains(nameOf(f)))
    val cleanDf = readDataFiles(spark, schema, clean, deletes, aliases)
    if (aff.isEmpty) return cleanDf
    require(aff.forall(_.endsWith(".parquet")),
      s"position deletes require a parquet payload; offending files: " +
        aff.filterNot(_.endsWith(".parquet")).map(nameOf).mkString(", "))
    val delPaths = aff.flatMap(f => posDels(nameOf(f))).distinct
    val dels = spark.read.schema(ManifestPosDeletes.DeleteSchema)
      .parquet(delPaths: _*)
      .withColumnRenamed("f", "__df").withColumnRenamed("p", "__dp")
    // renamed-column twins resolve the same way as the plain overload;
    // the provenance columns ride alongside until the join completes
    val raw = aliasResolved(
      spark.read.schema(aliasReadSchema(schema, aliases)).parquet(aff: _*)
        .withColumn("__f", col("_metadata.file_name"))
        .withColumn("__p", col("_metadata.row_index")),
      schema, aliases, extras = Seq("__f", "__p"))
    val posKept = raw.join(dels,
      raw("__f") === dels("__df") && raw("__p") === dels("__dp"), "left_anti")
    // predicate tombstones scoped to the affected files compose here:
    // a row dies if ANY applicable (file, predicate) pair is TRUE
    val affPreds = aff.map(nameOf).flatMap(n =>
      deletes.getOrElse(n, Seq.empty).map(p => (n, p)))
    val out =
      if (affPreds.isEmpty) posKept
      else {
        val cond = affPreds.map { case (n, p) =>
          col("__f") === lit(n) && filterToColumn(p).getOrElse(
            throw new IllegalStateException(
              s"untranslatable tombstone predicate $p — refusing to read " +
                "(dropping it would resurrect deleted rows)"))
        }.reduce(_ || _)
        posKept.filter(coalesce(not(cond), lit(true)))
      }
    val survivors = out.drop("__f", "__p")
    if (clean.isEmpty) survivors else survivors.unionByName(cleanDf)
  }

  /** Delete-aware variant: files group by their applicable tombstone
    * predicates (keyed by bare name) and each group reads with the
    * survivor filter applied — SQL DELETE semantics, keep on NOT TRUE.
    * Tombstone-free files read in one plain group, so a table with no
    * tombstones pays nothing.
    */
  private[sources] def readDataFiles(spark: org.apache.spark.sql.SparkSession,
      schema: StructType, files: Seq[String],
      deletes: Map[String, Seq[org.apache.spark.sql.sources.Filter]],
      aliases: Map[String, Seq[String]]):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    // the empty-file guard must fire BEFORE grouping: an insert-only
    // MERGE on a table with standing tombstones reaches here with zero
    // candidate files but a non-empty deletes map, and reducing zero
    // groups would throw (code-review r16)
    if (deletes.isEmpty || files.isEmpty)
      return readDataFiles(spark, schema, files, aliases)
    val groups = files.groupBy(f =>
      deletes.getOrElse(Paths.get(f).getFileName.toString, Seq.empty))
    groups.iterator.map { case (preds, fs) =>
      val base = readDataFiles(spark, schema, fs, aliases)
      if (preds.isEmpty) base
      else {
        // a tombstone is SEMANTICS, not an optimization (ADVICE r16):
        // an untranslatable predicate must fail the read loudly, never
        // flatMap-drop — silent dropping would RESURRECT deleted rows
        // in compaction / CoW merge / readCommitted
        val cond = preds.map(p => filterToColumn(p).getOrElse(
          throw new IllegalStateException(
            s"untranslatable tombstone predicate $p — refusing to read " +
              "(dropping it would resurrect deleted rows)")))
          .reduce(_ || _)
        // survivors: rows where NO applicable predicate is TRUE
        base.filter(coalesce(not(cond), lit(true)))
      }
    }.reduce(_.unionByName(_))
  }

  /** Tombstones applicable to the live manifest (empty when none) —
    * predicate references remapped into the live column space (r17
    * evolution: a tombstone written before a RENAME names the prior
    * column).
    */
  private[sources] def liveDeletes(root: Path):
      Map[String, Seq[org.apache.spark.sql.sources.Filter]] = {
    val lines = resolvedManifestLines(root, root.resolve("manifest.json"))
      .getOrElse(return Map.empty)
    val ts = ManifestDeletes.of(lines.tail)
    if (ts.isEmpty) Map.empty
    else {
      val p2c = ManifestEvolution.priorToCurrent(lines.tail)
      ManifestDeletes.byFile(
        ts.map(t => t.copy(filter = ManifestEvolution.remapFilter(t.filter, p2c))),
        lines.tail.filterNot(_.startsWith("#")))
    }
  }

  /** live column → its prior names, from the live evolution ledger. */
  private[sources] def liveAliases(root: Path): Map[String, Seq[String]] =
    ManifestEvolution.currentToPriors(ledgerLines(root))

  /** Publish a metadata-only schema-evolution commit: the new DDL, the
    * carried list tail, and the evolution ledger line — a numbered
    * snapshot like any other commit (time travel before it sees the old
    * names). Caller holds no lock; this takes the commit lock itself.
    */
  private[sources] def publishEvolution(root: Path, newSchema: StructType,
      line: String): Unit = publishEvolution(root, newSchema, Seq(line))

  /** Multi-line variant: a multi-change ALTER publishes ALL its ledger
    * lines in ONE atomic snapshot swap, so a failure can never commit
    * half the statement's evolution (code-review r18).
    */
  private[sources] def publishEvolution(root: Path, newSchema: StructType,
      lines: Seq[String]): Unit = withCommitLock(root) {
    require(Files.exists(root.resolve("manifest.json")),
      s"no manifest at $root — nothing to evolve")
    publish(root, (newSchema.toDDL +: rawListLines(root)) ++ lines)
  }

  /** Position deletes applicable to the live manifest: data-file name →
    * FULL delete-file paths (r17).
    */
  private[sources] def livePosDeletes(root: Path): Map[String, Seq[String]] = {
    val lines = resolvedManifestLines(root, root.resolve("manifest.json"))
      .getOrElse(return Map.empty)
    posDeletesOf(root, lines.tail)
  }

  private[sources] def posDeletesOf(root: Path,
      tail: Seq[String]): Map[String, Seq[String]] = {
    val pds = ManifestPosDeletes.of(tail)
    if (pds.isEmpty) Map.empty
    else ManifestPosDeletes.byFile(pds, tail.filterNot(_.startsWith("#")))
      .map { case (n, dels) =>
        n -> dels.map(d => root.resolve("data").resolve(d).toString) }
  }

  /** MERGE-ON-READ DELETE (VERDICT r15 Next #5): publish a predicate
    * TOMBSTONE naming the stats-overlapping candidate files instead of
    * rewriting them — O(predicate) bytes written, zero data jobs; the
    * read side filters row-level and [[compact]] folds tombstones into
    * a clean rewrite. Returns false (publishing nothing) when no
    * committed file can hold a match. Unsupported predicates are
    * refused loudly — a tombstone is semantics, not an optimization.
    */
  def deleteWhereMoR(root: String,
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean = {
    val rootP = Paths.get(root)
    require(filters.forall(filterToColumn(_).isDefined),
      s"unsupported MoR delete predicate: ${filters.mkString(", ")}")
    withCommitLock(rootP) {
      val (ddl, names) = rawManifest(rootP).getOrElse(
        throw new IllegalArgumentException(s"no manifest at $root — nothing to delete"))
      val stats = fileStats(root)
      val types = StructType.fromDDL(ddl).fields.map(f => f.name -> f.dataType).toMap
      val candidates = names.filter { n =>
        stats.get(n).forall(fs =>
          filters.forall(ManifestMeta.mayMatch(_, fs, types)))
      }
      if (candidates.isEmpty) return false
      val cond = filters.toSeq.reduceOption(
        org.apache.spark.sql.sources.And(_, _))
        .getOrElse(org.apache.spark.sql.sources.AlwaysTrue())
      val line = ManifestDeletes.line(
        ManifestDeletes.Tombstone(candidates.toSet, cond))
      publish(rootP, (ddl +: rawListLines(rootP)) :+ line)
      true
    }
  }

  /** (schema, committed file paths) from `manifest.json`, if published. */
  def readManifest(root: Path): Option[(StructType, Seq[String])] =
    rawManifest(root).map { case (ddl, names) =>
      (StructType.fromDDL(ddl),
        names.map(f => root.resolve("data").resolve(f).toString))
    }

  /** PUBLISH = the one linearization point every commit path shares:
    * write the manifest lines to a temp file, ATOMIC_MOVE over
    * `manifest.json`, and archive the same content as the next
    * `_snapshots/manifest-<gen>.json` — every commit (batch overwrite,
    * compaction, streaming epoch) is a numbered SNAPSHOT, which is what
    * makes time travel and snapshot-retention vacuum possible.
    */
  private[sources] def publish(root: Path, lines: Seq[String]): Long = {
    // COMMIT TIMESTAMP (`#t:<millis>`): every published state carries
    // its commit instant, the ledger TIMESTAMP AS OF resolves against.
    // Strictly increasing along the main lineage by construction (a
    // commit landing within the predecessor's millisecond records
    // prev+1), so distinct main generations never share an instant; any
    // `#t:`/`#g:`/`#br:` carried in via prior-ledger lines is replaced,
    // never accumulated (a fast-forward republishes a BRANCH snapshot's
    // content onto main — its branch mark must not travel with it).
    val prevTs = commitMillis(root.resolve("manifest.json"))
    val ts = math.max(System.currentTimeMillis(), prevTs.getOrElse(0L) + 1L)
    // the generation is stamped INTO the state (`#g:<gen>`) so the live
    // manifest knows its own main-lineage position — with branch
    // commits interleaving in the global numbering (r19 branches),
    // `snapshots().last` is the NEXT-gen counter, never "main's head"
    val gen = nextGen(root)
    val stamped = lines.filterNot(l => l.startsWith("#t:") ||
      l.startsWith("#g:") || l.startsWith(BranchMark)) :+
      s"#g:$gen" :+ s"#t:$ts"
    val bytes = stamped.mkString("\n").getBytes(StandardCharsets.UTF_8)
    val tmp = root.resolve("manifest.json.tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, root.resolve("manifest.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val snaps = root.resolve("_snapshots")
    Files.createDirectories(snaps)
    val stmp = snaps.resolve(s"manifest-$gen.json.tmp")
    Files.write(stmp, bytes)
    Files.move(stmp, snaps.resolve(s"manifest-$gen.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    recordHighWater(root, gen)
    gen
  }

  /** GENERATION HIGH-WATER MARK (`_gen.hw`, r19 branches): generation
    * numbers must NEVER be reassigned — anything still holding an
    * expired number (a concurrent `VERSION AS OF`, an operator's notes,
    * an external catalog) would silently resolve recycled content.
    * Today that stability is an ACCIDENT of the retention shape
    * (vacuum's count window always keeps the globally newest snapshot,
    * so `snapshots().last` never decreases); with branches interleaving
    * in the numbering and drop_branch making arbitrary suffixes
    * expirable in principle, the mark turns it into an INVARIANT: the
    * highest generation ever assigned is recorded under the commit
    * lock and the counter never dips below it, whatever a future
    * retention policy deletes. Absent (pre-mark tables) it reads 0 and
    * the snapshot-derived counter stands.
    */
  private def hwFile(root: Path): Path = root.resolve("_gen.hw")

  private def highWater(root: Path): Long = {
    val f = hwFile(root)
    if (!Files.exists(f)) 0L
    else new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      .trim.toLongOption.getOrElse(0L)
  }

  private[sources] def recordHighWater(root: Path, gen: Long): Unit =
    if (gen > highWater(root)) {
      val tmp = root.resolve("_gen.hw.tmp")
      Files.write(tmp, gen.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, hwFile(root),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      ()
    }

  private[sources] def nextGen(root: Path): Long =
    math.max(snapshots(root.toString).lastOption.getOrElse(0L),
      highWater(root)) + 1L

  /** The `#br:<name>` mark a BRANCH commit's archived snapshot carries
    * (r19): branch snapshots share the global generation numbering and
    * the `_snapshots/` directory, but they are NOT main lineage — the
    * mark is what TIMESTAMP AS OF resolution, the CDC feed, and the
    * snapshot stream filter on.
    */
  private[sources] val BranchMark = "#br:"

  /** The `#g:` main-lineage generation a manifest file recorded for
    * itself, if stamped (pre-branch manifests lack it — resolution
    * falls back to the newest unmarked snapshot).
    */
  private[sources] def commitGen(m: Path): Option[Long] =
    if (!Files.exists(m)) None
    else Files.readAllLines(m).toArray(Array.empty[String]).toSeq
      .find(_.startsWith("#g:")).flatMap(_.stripPrefix("#g:").toLongOption)

  /** Immutable-snapshot metadata cache: (isBranch, commit instant) per
    * absolute snapshot path. Snapshot manifests never change once
    * archived (the `_gen.hw` mark makes generation numbers
    * never-reassigned, so a path can never hold different content) —
    * without the cache, [[mainSnapshots]] re-reads EVERY retained
    * snapshot file on every streaming micro-batch poll (code-review
    * r19: a 1 s trigger over 100 retained generations was ~100 full
    * manifest reads per second where the pre-branch code did one
    * readdir). Bounded by wholesale clear, like segCache.
    */
  private val snapMetaCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Boolean, Long)]()

  private def snapMeta(root: Path, gen: Long): Option[(Boolean, Long)] = {
    val m = root.resolve("_snapshots").resolve(s"manifest-$gen.json")
    val key = m.toAbsolutePath.toString
    val hit = snapMetaCache.get(key)
    if (hit != null) return Some(hit)
    if (!Files.exists(m)) return None
    val lines = Files.readAllLines(m).toArray(Array.empty[String]).toSeq
    val meta = (lines.exists(_.startsWith(BranchMark)),
      lines.find(_.startsWith("#t:")).flatMap(_.stripPrefix("#t:").toLongOption)
        .getOrElse(Files.getLastModifiedTime(m).toMillis))
    if (snapMetaCache.size() > 4096) snapMetaCache.clear()
    snapMetaCache.put(key, meta)
    Some(meta)
  }

  /** Whether retained snapshot `gen` is a branch commit (carries a
    * `#br:` mark) — served from the immutable-snapshot cache.
    */
  private[sources] def isBranchSnapshot(root: Path, gen: Long): Boolean =
    snapMeta(root, gen).exists(_._1)

  /** Retained MAIN-lineage generations, ascending — [[snapshots]] minus
    * branch commits. This is the history TIMESTAMP AS OF, the CDC feed,
    * and the snapshot stream walk; the global list keeps numbering and
    * vacuum honest.
    */
  def mainSnapshots(root: String): Seq[Long] = {
    val rootP = Paths.get(root)
    snapshots(root).filterNot(isBranchSnapshot(rootP, _))
  }

  /** Main's LIVE generation — the `#g:` stamp of `manifest.json`
    * (fallback: newest unmarked snapshot, for pre-stamp manifests).
    * Every optimistic-concurrency base and CAS check on the main
    * lineage reads THIS, never `snapshots().last`: with an active
    * branch the global max is routinely a branch generation, and
    * anchoring main CAS to it would fail main DML spuriously (or pass
    * it wrongly).
    */
  def liveGen(root: String): Long =
    commitGen(Paths.get(root).resolve("manifest.json"))
      .getOrElse(mainSnapshots(root).lastOption.getOrElse(0L))

  /** The `#t:` commit instant of a manifest file, if recorded (absent
    * only for pre-r15 manifests — resolution falls back to file mtime).
    */
  private[sources] def commitMillis(m: Path): Option[Long] =
    if (!Files.exists(m)) None
    else Files.readAllLines(m).toArray(Array.empty[String]).toSeq
      .find(_.startsWith("#t:")).flatMap(_.stripPrefix("#t:").toLongOption)

  /** (generation, commit millis) of every retained MAIN-lineage
    * snapshot, ascending — the TIMESTAMP AS OF resolution ledger.
    * Branch commits (r19) are excluded: a timestamp read of the table
    * must never resolve to unpublished branch state.
    */
  def snapshotTimestamps(root: String): Seq[(Long, Long)] =
    snapshots(root).flatMap { g =>
      snapMeta(Paths.get(root), g) match {
        case Some((isBranch, ts)) if !isBranch => Some(g -> ts)
        case _ => None
      }
    }

  /** Published snapshot generations, ascending (expired ones excluded). */
  def snapshots(root: String): Seq[Long] = {
    val snaps = Paths.get(root).resolve("_snapshots")
    if (!Files.exists(snaps)) return Seq.empty
    val s = Files.list(snaps)
    try {
      val b = Seq.newBuilder[Long]
      val it = s.iterator()
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (n.startsWith("manifest-") && n.endsWith(".json"))
          n.stripPrefix("manifest-").stripSuffix(".json").toLongOption
            .foreach(b += _)
      }
      b.result().sorted
    } finally s.close()
  }

  /** TIME TRAVEL: read the table as of snapshot `gen` — valid for any
    * generation a retention-aware [[vacuum]] still protects (the
    * Iceberg `VERSION AS OF` read). One snapshot-manifest read = one
    * consistent historical state, same isolation as the live manifest.
    */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession, root: String,
      gen: Long): org.apache.spark.sql.DataFrame = {
    val m = Paths.get(root).resolve("_snapshots").resolve(s"manifest-$gen.json")
    val lines = resolvedManifestLines(Paths.get(root), m)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $gen of $root does not exist (expired or never published); " +
          s"available: ${snapshots(root).mkString(",")}"))
    val schema = StructType.fromDDL(lines.head)
    val names = lines.tail.filterNot(_.startsWith("#"))
    val files = names.map(f => Paths.get(root).resolve("data").resolve(f).toString)
    // a snapshot carries the tombstones, position deletes AND evolution
    // ledger published AT its generation — an as-of read before a MoR
    // delete sees the rows, before a RENAME sees the old names
    val p2c = ManifestEvolution.priorToCurrent(lines.tail)
    readDataFiles(spark, schema, files,
      ManifestDeletes.byFile(ManifestDeletes.of(lines.tail).map(t =>
        t.copy(filter = ManifestEvolution.remapFilter(t.filter, p2c))), names),
      posDeletesOf(Paths.get(root), lines.tail),
      ManifestEvolution.currentToPriors(lines.tail))
  }

  /** Epoch ids already published to the streaming manifest — parsed from
    * the `e<epoch>-` file-name prefix the streaming writer stamps, so
    * idempotent re-commit needs no side ledger.
    */
  def committedEpochs(root: String): Set[Long] = {
    val fromNames = rawManifest(Paths.get(root)).map(_._2).getOrElse(Seq.empty)
      .flatMap { n =>
        if (n.startsWith("e")) n.drop(1).takeWhile(_ != '-').toLongOption
        else None
      }
    // plus epochs carried through a compaction as `#e:` ledger lines —
    // replay detection must survive the file names being rewritten
    val fromLedger = ledgerLines(Paths.get(root))
      .flatMap(l => l.stripPrefix("#e:").toLongOption)
    (fromNames ++ fromLedger).toSet
  }

  /** The committed file list for `spark.read.json` — reading through the
    * manifest is what makes orphaned staging data invisible.
    */
  def committedFiles(root: String): Seq[String] =
    readManifest(Paths.get(root)).map(_._2).getOrElse(Seq.empty)

  /** Snapshot read: schema AND file list from ONE manifest read, so a
    * concurrent re-run's atomic manifest swap can never pair an old
    * schema with a new file list (VERDICT r12 "what's wrong" #2 —
    * the re-run-safe reader entry point).
    */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
      root: String): org.apache.spark.sql.DataFrame = {
    val (schema, files) = readManifest(Paths.get(root))
      .getOrElse(throw new IllegalArgumentException(
        s"no manifest at $root — write before reading"))
    readDataFiles(spark, schema, files, liveDeletes(Paths.get(root)),
      livePosDeletes(Paths.get(root)), liveAliases(Paths.get(root)))
  }

  /** LAKE MAINTENANCE — manifest compaction (VERDICT r13 Next #4): the
    * 100 TB small-file story the sink's own commit protocol motivates.
    * N committed files (batch parts or streaming epochs) re-publish as
    * `targetFiles` compacted ones through the SAME two-phase dance every
    * write uses — stage, move into data/, swap the manifest LAST — so a
    * reader can never observe a partial state: any single manifest read
    * yields either the full pre-compaction file set (all still on disk;
    * vacuum hasn't run) or the full compacted one. This is the
    * OPTIMIZE / rewrite-data-files operation of every table format
    * (Iceberg RewriteDataFilesAction, Delta OPTIMIZE), scaled to the
    * inspectable JSON manifest.
    *
    *   - IDEMPOTENT: already at `targetFiles`, it's a no-op — re-running
    *     after a crash-and-retry converges (spec-pinned);
    *   - EPOCH-SAFE: streaming epoch ids move from `e<id>-` file-name
    *     prefixes into `#e:` manifest ledger lines, so a resumed
    *     streaming query's replay detection still sees every committed
    *     epoch after its files were rewritten (spec-pinned);
    *   - rows are re-written DISTRIBUTED (a Spark job through the sink),
    *     never driver-buffered — at 100 TB compaction is itself a big
    *     job;
    *   - old files stay on disk until [[vacuum]] — the swap/vacuum split
    *     is what gives in-flight readers their grace period.
    */
  /** NOTE (r19): the partition-preserving no-op check verifies purity
    * from recorded bounds, which non-monotonic transform specs
    * (bucket) can never satisfy — a compact of a bucket-partitioned
    * table therefore always rewrites. Still CONVERGENT (every retry
    * lands the same valid state), just never free; size/row content is
    * identical either way.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, root: String,
      targetFiles: Int = 1, partitionBy: Seq[String] = Seq.empty,
      orderBy: Seq[String] = Seq.empty, targetFileBytes: Long = 0L): Unit = {
    val rootP = Paths.get(root)
    // CAS base: a commit landing while the compaction job rewrites
    // (e.g. a streaming epoch) must FAIL this compaction loudly —
    // silently publishing would drop the interleaved epoch's rows
    val baseGen = liveGen(root)
    val (schema, files) = readManifest(rootP)
      .getOrElse(throw new IllegalArgumentException(
        s"no manifest at $root — nothing to compact"))
    val names = rawManifest(rootP).map(_._2).getOrElse(Seq.empty)
    val deletes = liveDeletes(rootP)
    val posDels = livePosDeletes(rootP)
    // no-op checks (idempotent re-run after crash-and-retry converges):
    // plain tables are compact at <= targetFiles; a PARTITION-PRESERVING
    // compaction is done when every file is partition-pure and every
    // partition value has exactly one file. Standing TOMBSTONES and
    // POSITION DELETES always force the rewrite — folding them into
    // clean files is half of what compaction is FOR on a MoR table —
    // and so does a live EVOLUTION LEDGER (r17): materializing renamed/
    // dropped columns under live names is what clears the ledger's
    // name reservations and restores the columnar read path.
    val evoLive = ledgerLines(rootP).exists(ManifestEvolution.isLine)
    if (partitionBy.isEmpty) {
      if (files.size <= targetFiles && deletes.isEmpty && posDels.isEmpty &&
        !evoLive) return
    } else if (deletes.isEmpty && posDels.isEmpty && !evoLive) {
      val stats = fileStats(root)
      // partition entries may be transform specs (r19): purity is the
      // verified single TRANSFORM value per file, and the sort claim
      // names the SOURCE columns
      val specs = partitionBy.map(PartitionTransforms.parse)
      val keys = names.map(n => stats.get(n).flatMap(fs =>
        PartitionTransforms.pureTuple(specs, fs.cols.get)))
      // no-op needs MORE than purity + one-file-per-value: every file's
      // recorded sort claim must already start with the order this
      // compaction would establish, or a run meant to (re)sort silently
      // does nothing (code-review r15)
      val wantSorted = (specs.map(_.source) ++ orderBy).distinct
      val sortedOk = names.forall(n => stats.get(n).exists(
        _.sorted.startsWith(wantSorted)))
      if (sortedOk && keys.forall(_.isDefined) &&
          keys.flatten.distinct.length == keys.length) return
    }
    val epochs = committedEpochs(root)
    // standing tombstones AND position deletes FOLD here: the rewrite
    // reads survivors only, and the replace commit publishes a
    // delete-free manifest (the delete files orphan, vacuum reclaims)
    // renamed columns MATERIALIZE here: the alias-aware read resolves
    // prior-named cells into the live schema, the rewrite stores live
    // names, and the replace commit drops the evolution ledger — a
    // compaction clears every rename/drop reservation (spec-pinned)
    val df = readDataFiles(spark, schema, files, deletes, posDels,
      liveAliases(rootP))
    // format-preserving: an all-parquet table compacts to parquet
    val fmt = if (files.forall(_.endsWith(".parquet"))) "parquet" else "json"
    // partition-preserving: the rewrite flows through the same clustered
    // write + per-value file roll as any partitioned INSERT, so the
    // compacted table keeps the purity its KeyGroupedPartitioning /
    // reported-ordering claims stand on (plain tables just coalesce)
    val base =
      if (partitionBy.nonEmpty) df
      else df.coalesce(targetFiles)
    // a rewrite must not strip the table's point-lookup skipping: the
    // columns every current file blooms re-opt-in (code-review r16)
    val rawNames = rawManifest(rootP).map(_._2).getOrElse(Seq.empty)
    val bloomCols = derivedBloomCols(rawNames, fileStats(root))
    val w0 = base.write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).option("format", fmt)
      .option("expectedGen", baseGen.toString)
    val w1 = if (partitionBy.nonEmpty)
      w0.option("partitionBy", partitionBy.mkString(","))
        .option("orderBy", orderBy.mkString(","))
    else w0
    val w2 = if (bloomCols.nonEmpty)
      w1.option("bloomFor", bloomCols.mkString(",")) else w1
    val w3 = if (targetFileBytes > 0L)
      w2.option("targetFileBytes", targetFileBytes.toString) else w2
    (if (epochs.nonEmpty)
       w3.option("carryEpochs", epochs.toSeq.sorted.mkString(","))
     else w3).save()
  }

  /** DATA-RECLUSTERING REWRITE (VERDICT r17 Next #2): the Iceberg
    * `rewrite_data_files(sort_order => ...)` shape — change the LAYOUT
    * of a committed table, which [[compact]] cannot (compact restores
    * file count and partition purity but keeps whatever clustering the
    * table was written with). Two arms:
    *
    *   - `orderBy`: a GLOBAL range re-sort — rows repartitionByRange
    *     over the sort columns into `targetFiles` tasks, each task's
    *     file internally sorted (the sink's RequiresDistributionAndOrdering
    *     write), so files carry DISJOINT [min,max] envelopes and a
    *     recorded `sorted` claim: point/range queries on the sort key
    *     prune to one file, and the scan's reported ordering makes
    *     downstream sorts redundant;
    *   - `zorderBy` (2-3 integral columns): a Morton-curve re-cluster —
    *     each column scales into 16 bits off the committed stats
    *     envelopes (no extra data pass when every file carries bounds),
    *     bits interleave into a z-key, rows range-partition + sort by
    *     it, and the key is DROPPED before write. No single-column sort
    *     claim is recorded (none would be true); the win is that every
    *     file's per-column envelopes become tight z-cells, so selective
    *     predicates on ANY of the z columns prune files.
    *
    * Shares compact's commit discipline: deletes/position-deletes fold,
    * renamed columns materialize (ledger clears), format preserved,
    * blooms re-opted-in, streaming epochs carried, CAS on the base
    * generation (a concurrent commit fails the rewrite loudly), old
    * files retire via the atomic snapshot swap and vacuum later.
    *
    * PARTITIONED tables are the caller's responsibility to route to
    * `compact(partitionBy, orderBy)` instead — a global re-sort would
    * silently demote their purity claims (the CALL procedure refuses).
    *
    * Scale shape: one distributed read-shuffle-write job (exactly a
    * 100 TB table rewrite), plus an O(files) driver pass over recorded
    * stats; the only data-pass fallback is the z-bounds aggregate when
    * a file predates stats, and that aggregate is 2·|zorderBy| cells.
    */
  def rewrite(spark: org.apache.spark.sql.SparkSession, root: String,
      orderBy: Seq[String] = Seq.empty, zorderBy: Seq[String] = Seq.empty,
      targetFiles: Int = 4,
      /** The partition-pure guard cannot distinguish a declared
        * partitioning from a previous one-file-per-value range sort —
        * both look identical in the committed stats. A caller who KNOWS
        * the table is unpartitioned and wants the global recluster
        * anyway (demoting the incidental purity claims) passes true
        * (code-review r19).
        */
      allowClaimDemotion: Boolean = false): Unit = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, shiftleft, shiftright}
    require(orderBy.nonEmpty ^ zorderBy.nonEmpty,
      "rewrite wants exactly one of order_by / zorder")
    require(targetFiles >= 1, s"target_files must be >= 1 (got $targetFiles)")
    val rootP = Paths.get(root)
    val baseGen = liveGen(root)
    val (schema, files) = readManifest(rootP)
      .getOrElse(throw new IllegalArgumentException(
        s"no manifest at $root — nothing to rewrite"))
    val names = rawManifest(rootP).map(_._2).getOrElse(Seq.empty)
    val stats = fileStats(root)
    val deletes = liveDeletes(rootP)
    val posDels = livePosDeletes(rootP)
    val evoLive = ledgerLines(rootP).exists(ManifestEvolution.isLine)
    (orderBy ++ zorderBy).foreach(c => require(schema.fieldNames.contains(c),
      s"unknown rewrite column $c — schema: ${schema.fieldNames.mkString(",")}"))
    // idempotent no-op (orderBy arm): every file already claims the
    // asked order, the file count is at target, and nothing needs
    // folding — a crash-and-retry converges. The z-order arm has no
    // recorded claim to check, so an explicit z-rewrite always runs.
    if (orderBy.nonEmpty && deletes.isEmpty && posDels.isEmpty && !evoLive &&
        files.size <= targetFiles && names.nonEmpty &&
        names.forall(n => stats.get(n).exists(_.sorted.startsWith(orderBy))))
      return
    // PARTITIONED-TABLE GUARD in the API itself (ADVICE r18): the CALL
    // procedure refuses via the declared spec, but a direct call on a
    // table whose committed files carry partition-pure claims would
    // silently rewrite it unpartitioned — reads stay correct, but the
    // KeyGrouped/SPJ planning claims are lost without warning. The
    // claim is DERIVED from the committed stats (the same sorted-prefix
    // + purity rule the scan verifies), so the guard needs no catalog
    // handle — and it sits AFTER the no-op check, so a crash-retry on
    // an already-satisfied rewrite still converges cleanly even when
    // tiny output files happen to be single-key.
    val derivedParts = derivedLayout(names, stats, schema)._1
    require(derivedParts.isEmpty || allowClaimDemotion,
      s"table at $root carries partition-pure files on " +
        s"${derivedParts.mkString(",")} — a global rewrite would demote " +
        "those claims; use compact(partitionBy, orderBy) or the " +
        "partition-scoped rewritePartitioned(...) instead, or pass " +
        "allowClaimDemotion=true if the purity is incidental (e.g. a " +
        "previous one-file-per-value range sort on an unpartitioned table)")
    val df = readDataFiles(spark, schema, files, deletes, posDels,
      liveAliases(rootP))
    val fmt = if (files.forall(_.endsWith(".parquet"))) "parquet" else "json"
    val bloomCols = derivedBloomCols(names, stats)
    val epochs = committedEpochs(root)

    val (arranged, claim) =
      if (orderBy.nonEmpty)
        (df.repartitionByRange(targetFiles, orderBy.map(df(_)): _*), orderBy)
      else {
        val zk = mortonColumn(zorderBy, schema,
          zBoundsOf(df, names, stats, zorderBy))
        (df.withColumn("__z", zk)
          .repartitionByRange(targetFiles, col("__z"))
          .sortWithinPartitions(col("__z"))
          .drop("__z"), Seq.empty[String])
      }

    val w0 = arranged.write.format("graft.sources.ManifestSink")
      .mode("overwrite").option("path", root).option("format", fmt)
      .option("expectedGen", baseGen.toString)
    val w1 = if (claim.nonEmpty) w0.option("orderBy", claim.mkString(",")) else w0
    val w2 = if (bloomCols.nonEmpty)
      w1.option("bloomFor", bloomCols.mkString(",")) else w1
    (if (epochs.nonEmpty)
       w2.option("carryEpochs", epochs.toSeq.sorted.mkString(","))
     else w2).save()
  }

  private def anyToLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case n: java.lang.Number => n.longValue()
    case other => throw new IllegalStateException(
      s"non-integral stats bound $other in zorder rewrite")
  }

  /** Per-column [min,max] bounds for z-scaling over the named files:
    * from the committed stats envelopes when every file carries them
    * (driver-only, zero data reads), else ONE 2·|cols|-cell aggregate
    * over `df` — never a collect of data.
    */
  private def zBoundsOf(df: org.apache.spark.sql.DataFrame,
      names: Seq[String], stats: Map[String, ManifestMeta.FileStats],
      zorderBy: Seq[String]): String => (Long, Long) = {
    import org.apache.spark.sql.functions.col
    def statsBounds(c: String): Option[(Long, Long)] = {
      val per = names.map(n => stats.get(n).flatMap { fs =>
        fs.cols.get(c).flatMap(cs => for { mn <- cs.min; mx <- cs.max }
          yield (anyToLong(mn), anyToLong(mx)))
      })
      if (per.nonEmpty && per.forall(_.isDefined))
        Some((per.flatten.map(_._1).min, per.flatten.map(_._2).max))
      else None
    }
    lazy val aggRow = df.agg(
      org.apache.spark.sql.functions.min(col(zorderBy.head)),
      (zorderBy.tail.flatMap(c => Seq(
        org.apache.spark.sql.functions.min(col(c)),
        org.apache.spark.sql.functions.max(col(c)))) :+
        org.apache.spark.sql.functions.max(col(zorderBy.head))): _*).head()
    def aggBounds(j: Int): (Long, Long) = {
      // layout: min(c0), [min(c1),max(c1)], [min(c2),max(c2)], max(c0)
      val (mnIdx, mxIdx) =
        if (j == 0) (0, aggRow.length - 1) else (2 * j - 1, 2 * j)
      if (aggRow.isNullAt(mnIdx) || aggRow.isNullAt(mxIdx)) (0L, 0L)
      else (anyToLong(aggRow.get(mnIdx)), anyToLong(aggRow.get(mxIdx)))
    }
    c => statsBounds(c).getOrElse(aggBounds(zorderBy.indexOf(c)))
  }

  /** The Morton z-key as a codegen-friendly Column: each of 2-3
    * integral columns scales into 16 bits off its [min,max] bounds in
    * exact LONG arithmetic (`div`, not `/` — Column division is double
    * and loses precision past 2^53; nulls cluster at the low edge;
    * width guarded in BigInt against hash-wide domains, code-review
    * r18), then bit i of dimension j lands at z-bit i·d+j (disjoint
    * bits, so plain sum == bitwise OR). Shared by the global z-order
    * rewrite and the partition-scoped partial rewrite.
    */
  private def mortonColumn(zorderBy: Seq[String], schema: StructType,
      boundOf: String => (Long, Long)): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    require(zorderBy.length >= 2 && zorderBy.length <= 3,
      s"zorder wants 2-3 columns (got ${zorderBy.length}) — 16 bits " +
        "per dimension must fit one long")
    zorderBy.foreach { c =>
      val dt = schema(c).dataType
      require(dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType,
        s"zorder column $c must be integral (got $dt)")
    }
    val d = zorderBy.length
    val scaled = zorderBy.map { c =>
      val (mn, mx) = boundOf(c)
      val width = BigInt(mx) - BigInt(mn)
      require(width <= BigInt(Long.MaxValue / 65535L),
        s"zorder column $c spans $width — too wide to scale into 16 bits")
      val span = width.toLong.max(1L)
      org.apache.spark.sql.functions.expr(
        s"CAST((coalesce(`$c`, ${mn}L) - ${mn}L) * 65535 div ${span}L " +
          "AS BIGINT)")
    }
    (for { i <- 0 until 16; j <- 0 until d } yield
      shiftleft(shiftright(scaled(j), i).bitwiseAND(lit(1L)), i * d + j))
      .reduce(_ + _)
  }

  /** Summary of a [[rewritePartitioned]] run: groups in scope, groups
    * this call rewrote, replace snapshots published.
    */
  case class PartialRewriteSummary(groupsTotal: Int, groupsRewritten: Int,
      commits: Int)

  /** PARTIAL-PROGRESS, PARTITION-SCOPED REWRITE (r19, VERDICT r18 Next
    * #1 — the Iceberg `rewrite_data_files(partial-progress.enabled)`
    * shape): re-cluster a PARTITIONED table N partition values per
    * REPLACE SNAPSHOT instead of one global commit, so at 100 TB a
    * crash or CAS loss discards at most one batch, never hours of
    * work. Each batch is its own CAS-protected, retry-bounded commit
    * ([[withCommitRetry]] around a full re-plan); between batches the
    * table stays fully readable — a half-migrated state is just some
    * partitions reclustered and some not, every snapshot exact.
    *
    * RESUME comes from recorded claims, not a progress file: a
    * partition group is DONE when its files are partition-pure, carry
    * the asked layout claim (`sorted` startsWith partitionBy++orderBy
    * with disjoint first-order-key envelopes, or the `zorder` marker
    * for the curve arm), and no MoR delete scopes them — so a re-run
    * after a crash skips completed partitions and rewrites no file
    * twice (spec-pinned). Files IMPURE under the live spec (an older
    * partition-spec vintage) form their own groups and migrate to pure
    * files as they rewrite — this is also the incremental
    * spec-migration path.
    *
    *   - `orderBy` arm: per-partition sort through the sink's
    *     RequiresDistributionAndOrdering (cluster on partitionBy, sort
    *     partitionBy++orderBy), one pure sorted file per value;
    *   - `zorderBy` arm: rows sort by (partitionBy, morton key) with
    *     the layout PRE-ARRANGED (`layoutProvided` — a declared
    *     requirement would let Spark re-sort by the partition prefix
    *     alone and scramble the curve); bounds come from the batch's
    *     stats envelopes; files record the `zorder` claim;
    *   - `where` scopes the run to matching partitions (file-level
    *     stats evaluation, conservative on impure files) — the
    *     `rewrite(table, zorder => ..., where => 'p = 3')` shape;
    *   - deletes/position deletes scoped to a batch's files FOLD in
    *     that batch's rewrite (the commit prunes their manifest lines);
    *     a live schema-evolution ledger stays (rewritten files store
    *     live names and read fine; a full compact clears the ledger).
    *
    * Scale shape: each batch reads/shuffles/writes only its partitions'
    * files; driver work is O(files) claim checks per batch.
    */
  def rewritePartitioned(spark: org.apache.spark.sql.SparkSession,
      root: String, partitionBy: Seq[String],
      orderBy: Seq[String] = Seq.empty, zorderBy: Seq[String] = Seq.empty,
      partitionsPerCommit: Int = 8,
      where: Option[(String, Any)] = None,
      targetFileBytes: Long = 0L): PartialRewriteSummary = {
    import org.apache.spark.sql.functions.col
    require(partitionBy.nonEmpty,
      "rewritePartitioned wants the table's partition columns — use " +
        "rewrite() for unpartitioned tables")
    require(orderBy.nonEmpty ^ zorderBy.nonEmpty,
      "rewritePartitioned wants exactly one of orderBy / zorderBy")
    require(partitionsPerCommit >= 1,
      s"partitionsPerCommit must be >= 1 (got $partitionsPerCommit)")
    // the per-partition rewrite certifies progress from recorded
    // claims, which bucket's hash-scattered values can never satisfy —
    // a bucket spec would re-rewrite every group on every call
    // (code-review r19). Bucket tables take compact() for file-count
    // maintenance; their partition axis has no recluster semantics.
    partitionBy.map(PartitionTransforms.parse).foreach(t =>
      require(t.monotonic,
        s"rewritePartitioned cannot certify progress under ${t.render} " +
          "(hash-scattered values have no verifiable purity) — use " +
          "compact() on bucket-partitioned tables"))
    val rootP = Paths.get(root)
    var commits = 0
    var rewrittenGroups = 0
    var groupsTotal = -1
    // groups THIS CALL already rewrote: guarantees no group is batched
    // twice within a run
    val processed = scala.collection.mutable.Set.empty[String]
    // file names THIS CALL's commits produced: the TERMINATION
    // backstop (code-review r19) — a group whose purity can never be
    // certified (null partition keys, stats-poisoned columns) would
    // otherwise re-enter `pending` forever under a fresh name after
    // every rewrite; a group made entirely of this call's own output
    // is done by construction
    val produced = scala.collection.mutable.Set.empty[String]
    var done = false
    while (!done) {
      withCommitRetry() {
        val (schema, _) = readManifest(rootP).getOrElse(
          throw new IllegalArgumentException(
            s"no manifest at $root — nothing to rewrite"))
        // partition entries may be transform specs (r19); data-frame
        // operations run on their SOURCE columns
        val partSpecs = partitionBy.map(PartitionTransforms.parse)
        val partSources = partSpecs.map(_.source)
        (partSources ++ orderBy ++ zorderBy ++ where.map(_._1).toSeq)
          .foreach(c => require(schema.fieldNames.contains(c),
            s"unknown rewrite column $c — schema: " +
              schema.fieldNames.mkString(",")))
        val baseGen = liveGen(root)
        val names = rawManifest(rootP).map(_._2).getOrElse(Seq.empty)
        val stats = fileStats(root)
        val types = schema.fields.map(f => f.name -> f.dataType).toMap
        val deletes = liveDeletes(rootP)
        val posDels = livePosDeletes(rootP)
        val aliases = liveAliases(rootP)

        def pureKey(n: String): Option[Seq[Any]] = stats.get(n).flatMap(fs =>
          PartitionTransforms.pureTuple(partSpecs, fs.cols.get))
        val whereF: Option[org.apache.spark.sql.sources.Filter] =
          where.map { case (c, v) =>
            org.apache.spark.sql.sources.EqualTo(c, v) }
        def inScope(n: String): Boolean = whereF.forall(f =>
          stats.get(n).forall(fs => ManifestMeta.mayMatch(f, fs, types)))

        // (group id, files, pure): pure tuples in rendered-key order,
        // then impure files (older spec vintages) each alone, by name —
        // a deterministic sweep order so batches and resume agree
        case class Group(id: String, files: Seq[String], pure: Boolean)
        val keyed = names.map(n => n -> pureKey(n))
        val pureGroups = keyed.collect { case (n, Some(k)) => (k, n) }
          .groupBy(_._1).toSeq
          .map { case (k, fs) =>
            // key cells ESCAPE before joining: a raw join would
            // collide composite string keys (and a control-char
            // separator does not survive every editor) — code-review r19
            Group("k:" + k.map(v => ManifestMeta.quote(String.valueOf(v)))
              .mkString(","),
              fs.map(_._2).sorted, pure = true) }
          .sortBy(_.id)
        val impureGroups = keyed.collect { case (n, None) => n }.sorted
          .map(n => Group(s"f:$n", Seq(n), pure = false))
        // TERMINATION: a group made wholly of THIS call's own rewrite
        // output is complete by construction — without this, a group
        // whose purity can never be certified (null partition keys,
        // poisoned stats) would re-enter pending under a fresh name
        // after every rewrite, forever (code-review r19)
        def selfProduced(g: Group): Boolean =
          g.files.nonEmpty && g.files.forall(produced.contains)
        val scoped = (pureGroups ++ impureGroups)
          .filter(_.files.exists(inScope))
        if (groupsTotal < 0) groupsTotal = scoped.size

        val wantSorted = (partSources ++ orderBy).distinct
        def envOf(n: String, c: String): Option[(Any, Any)] =
          stats.get(n).flatMap(_.cols.get(c)).flatMap(cs =>
            for { mn <- cs.min; mx <- cs.max } yield (mn, mx))
        // strict [min,max] disjointness across the group's files on the
        // first order key — the "actually reclustered" certificate a
        // bare sort claim can't give (two separately sorted appends
        // both claim the order but overlap)
        def disjointOn(files: Seq[String], c: String): Boolean = {
          if (files.size <= 1) return true
          val envs = files.map(envOf(_, c))
          if (envs.exists(_.isEmpty)) return false
          def lt(a: Any, b: Any): Boolean = (a, b) match {
            case (x: Long, y: Long) => x < y
            case (x: Double, y: Double) => x < y
            case (x: String, y: String) =>
              org.apache.spark.unsafe.types.UTF8String.fromString(x)
                .compareTo(org.apache.spark.unsafe.types.UTF8String
                  .fromString(y)) < 0
            case _ => false
          }
          val sorted = envs.flatten.sortWith((a, b) => lt(a._1, b._1))
          // a shared BOUNDARY value is allowed (a size-bounded roll can
          // split one key run mid-file) — only a real interior overlap
          // marks the group un-reclustered
          sorted.sliding(2).forall {
            case Seq((_, hi1), (lo2, _)) => !lt(lo2, hi1)
            case _ => true
          }
        }
        // a file is order-claim-OK under EITHER recorded shape: the
        // rewrite's own claim (orderBy alone — layout-provided writes)
        // or the declared-layout claim from ordinary appends/compacts
        // (sources ++ orderBy; with a pure partition tuple the source
        // prefix is constant, so orderBy-sortedness follows)
        def claimOk(n: String): Boolean = stats.get(n).exists(fs =>
          fs.sorted.startsWith(orderBy) || fs.sorted.startsWith(wantSorted))
        def isDone(g: Group): Boolean = g.pure &&
          g.files.forall(n => !deletes.contains(n) && !posDels.contains(n)) &&
          (if (orderBy.nonEmpty)
             g.files.forall(claimOk) && disjointOn(g.files, orderBy.head)
           else
             g.files.forall(n => stats.get(n).exists(_.zorder == zorderBy)))

        val pending = scoped
          .filter(g => !processed.contains(g.id) && !selfProduced(g) &&
            !isDone(g))
          .take(partitionsPerCommit)
        if (pending.isEmpty) done = true
        else {
          val batchNames = pending.flatMap(_.files)
          val batchPaths = batchNames.map(n =>
            rootP.resolve("data").resolve(n).toString)
          val df = readDataFiles(spark, schema, batchPaths, deletes,
            posDels, aliases)
          val fmt = derivedFormat(names)
          val blm = derivedBloomCols(names, stats)
          val w0 =
            if (orderBy.nonEmpty) {
              // pre-cluster by the TRANSFORM value, not the source: a
              // day's rows scatter across source-clustered tasks (many
              // ts values per day), which would write several
              // k-overlapping files per day and the done-check could
              // never certify the recluster (code-review r19). The
              // computed keys repartition each partition value into one
              // task; rows sort (key, orderBy) so the roll cuts exactly
              // one file per value, claimed sorted by orderBy.
              val pNames = partSpecs.indices.map(i => s"__p$i")
              var framed = df
              partSpecs.zip(pNames).foreach { case (t, n) =>
                framed = framed.withColumn(n,
                  PartitionTransforms.column(t, schema))
              }
              framed
                .repartition(pNames.map(col): _*)
                .sortWithinPartitions(
                  (pNames.map(col) ++ orderBy.map(col)): _*)
                .drop(pNames: _*)
                .write.format("graft.sources.ManifestSink")
                .option("partitionBy", partitionBy.mkString(","))
                .option("layoutProvided", "true")
                .option("sortedClaim", orderBy.mkString(","))
            } else {
              val zk = mortonColumn(zorderBy, schema,
                zBoundsOf(df, batchNames, stats, zorderBy))
              df.withColumn("__z", zk)
                .repartition(partSources.map(col): _*)
                .sortWithinPartitions((partSources.map(col) :+ col("__z")): _*)
                .drop("__z")
                .write.format("graft.sources.ManifestSink")
                .option("partitionBy", partitionBy.mkString(","))
                .option("layoutProvided", "true")
                .option("zorderClaim", zorderBy.mkString(","))
            }
          val w1 = w0.mode("append").option("path", root)
            .option("format", fmt)
            .option("expectedGen", baseGen.toString)
            .option("replaceFiles", batchNames.mkString(","))
          val w2 = if (blm.nonEmpty)
            w1.option("bloomFor", blm.mkString(",")) else w1
          (if (targetFileBytes > 0L)
             w2.option("targetFileBytes", targetFileBytes.toString)
           else w2).save()
          // names this commit added = the batch's successors: feeds the
          // selfProduced termination backstop
          val postNames = rawManifest(rootP).map(_._2).getOrElse(Seq.empty)
          produced ++= postNames.filterNot(names.toSet)
          commits += 1
          rewrittenGroups += pending.size
          processed ++= pending.map(_.id)
        }
      }
    }
    PartialRewriteSummary(groupsTotal, rewrittenGroups, commits)
  }

  /** Parse the procedure's `where => 'col = literal'` scope against the
    * table schema: one equality, the literal typed by the column
    * (strings quoted with single quotes).
    */
  def parseWhereEquality(s: String,
      schema: StructType): (String, Any) = {
    val i = s.indexOf('=')
    require(i > 0, s"where wants `col = literal` (got '$s')")
    val c = s.substring(0, i).trim
    val raw = s.substring(i + 1).trim
    val f = schema.fields.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(
        s"where references unknown column $c — schema: " +
          schema.fieldNames.mkString(",")))
    val v: Any = f.dataType match {
      case StringType =>
        require(raw.length >= 2 && raw.startsWith("'") && raw.endsWith("'"),
          s"string literal in where must be single-quoted (got $raw)")
        raw.substring(1, raw.length - 1)
      case LongType => raw.toLong
      case IntegerType => raw.toInt
      case DoubleType => raw.toDouble
      case other => throw new IllegalArgumentException(
        s"unsupported where column type $other")
    }
    (c, v)
  }

  // ---------------------------------------------------------------
  // SNAPSHOT REFS — TAGS (r19, VERDICT r18 Next #4): named pointers to
  // snapshot generations, the "v2-training-cut" primitive a 100 TB
  // operator tags before vacuuming around it. Refs live in
  // `_refs.json` (one closed-JSON line per tag, atomic swap) — a
  // SIDECAR, not manifest ledger lines, because a tag references a
  // GENERATION independent of the live state and must survive
  // replace-shaped commits that start the line list fresh. Mutations
  // take the commit lock so a tag can never race the vacuum deciding
  // what to expire. `VERSION AS OF 'name'` resolves through the
  // catalog; vacuum refuses to expire tagged generations.
  // ---------------------------------------------------------------

  private def refsFile(root: Path): Path = root.resolve("_refs.json")

  /** A named snapshot ref: a TAG (immutable retention anchor) or a
    * BRANCH (r19 — a mutable head that advances with branch commits).
    * For a branch, `base` is the MAIN generation the branch's lineage
    * forked from — the generation main must still be at for
    * [[fastForward]] to publish (the write-audit-publish contract:
    * a diverged main refuses, it never merges silently).
    */
  case class SnapRef(name: String, gen: Long, kind: String, base: Long)

  /** All named refs, name-sorted. A damaged line drops (the ref
    * protects nothing it can't name) — never bricks reads. Pre-branch
    * ref lines ({name, gen}) parse as tags.
    */
  def refs(root: String): Seq[SnapRef] = {
    val f = refsFile(Paths.get(root))
    if (!Files.exists(f)) Seq.empty
    else Files.readAllLines(f).toArray(Array.empty[String]).toSeq
      .filter(_.nonEmpty).flatMap { l =>
        try {
          val m = ManifestMeta.parse(l).asInstanceOf[Map[String, Any]]
          val g = m("gen").asInstanceOf[Long]
          Some(SnapRef(m("name").asInstanceOf[String], g,
            m.getOrElse("kind", "tag").asInstanceOf[String],
            m.getOrElse("base", g).asInstanceOf[Long]))
        } catch { case _: Exception => None }
      }
  }

  /** (tag name, generation) pairs, name-sorted. */
  def tags(root: String): Seq[(String, Long)] =
    refs(root).filter(_.kind == "tag").map(r => (r.name, r.gen))

  /** Branch refs, name-sorted. */
  def branches(root: String): Seq[SnapRef] =
    refs(root).filter(_.kind == "branch")

  private def writeRefs(root: Path, rs: Seq[SnapRef]): Unit = {
    val lines = rs.sortBy(_.name).map { r =>
      // tags keep the pre-branch two-field shape (older readers and
      // fixtures parse it); branches add kind + fork base
      if (r.kind == "tag")
        ManifestMeta.encodeObject(Map("name" -> r.name, "gen" -> r.gen))
      else ManifestMeta.encodeObject(Map("name" -> r.name, "gen" -> r.gen,
        "kind" -> r.kind, "base" -> r.base))
    }
    val tmp = root.resolve("_refs.json.tmp")
    Files.write(tmp, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, refsFile(root),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Shared ref-name validation: word-shaped, never all digits (so
    * `VERSION AS OF` resolution stays unambiguous with generations),
    * unique across BOTH kinds (a tag and a branch sharing a name would
    * make `VERSION AS OF 'name'` ambiguous).
    */
  private def validateRefName(name: String, kind: String): Unit = {
    require(name.nonEmpty &&
      name.forall(c => c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"$kind name '$name' must be non-empty [A-Za-z0-9._-]")
    require(name.toLongOption.isEmpty,
      s"$kind name '$name' cannot be all digits — VERSION AS OF resolves " +
        "numbers as snapshot generations")
  }

  /** Tag snapshot `gen` (default: the live generation) as `name`;
    * returns the tagged generation. Idempotent on the same (name, gen);
    * re-pointing an existing tag refuses loudly (drop it first —
    * silently moving a retention anchor is how tagged data gets
    * vacuumed). Names are word-shaped and never all digits, so
    * `VERSION AS OF` resolution stays unambiguous with generations.
    */
  def tag(root: String, name: String, gen: Option[Long] = None): Long =
    withCommitLock(Paths.get(root)) {
      validateRefName(name, "tag")
      val g = gen.getOrElse {
        val lg = liveGen(root)
        if (lg > 0L) lg
        else throw new IllegalArgumentException(s"no snapshots at $root to tag")
      }
      require(Files.exists(Paths.get(root).resolve("_snapshots")
          .resolve(s"manifest-$g.json")),
        s"snapshot $g of $root does not exist (expired or never " +
          s"published); available: ${snapshots(root).mkString(",")}")
      // a branch commit is not table history — tagging it would make
      // VERSION AS OF '<tag>' read unpublished state as if it were
      // (address a branch head through its branch name instead)
      require(!isBranchSnapshot(Paths.get(root), g),
        s"snapshot $g of $root is a BRANCH commit — tags anchor main " +
          "lineage; read the branch through its own name")
      val cur = refs(root)
      cur.find(_.name == name) match {
        case Some(r) if r.kind == "tag" && r.gen == g => g // idempotent re-tag
        case Some(r) if r.kind == "tag" => throw new IllegalArgumentException(
          s"tag $name already points at generation ${r.gen} of $root — " +
            "drop_tag it first (a silently moved tag un-anchors retention)")
        case Some(_) => throw new IllegalArgumentException(
          s"a branch named $name already exists on $root — " +
            "VERSION AS OF resolution would be ambiguous")
        case None =>
          writeRefs(Paths.get(root), cur :+ SnapRef(name, g, "tag", g))
          g
      }
    }

  /** Remove tag `name`; returns whether it existed. The generation it
    * anchored becomes vacuum-expirable again.
    */
  def dropTag(root: String, name: String): Boolean =
    withCommitLock(Paths.get(root)) {
      val cur = refs(root)
      val left = cur.filterNot(r => r.kind == "tag" && r.name == name)
      if (left.size == cur.size) false
      else { writeRefs(Paths.get(root), left); true }
    }

  // ---------------------------------------------------------------
  // SNAPSHOT BRANCHES (r19, the write-audit-publish primitive —
  // VERDICT r18 ask #4's second half): a branch is a MUTABLE named
  // ref. Branch commits publish REAL archived snapshots (same global
  // generation numbering, same `_segments/`+`data/` reuse) marked
  // `#br:<name>`, advancing only the branch's head in `_refs.json` —
  // `manifest.json` (main) never moves, so readers of the table see
  // nothing until [[fastForward]] republishes the audited branch head
  // onto main. Because segments and data files carry BY REFERENCE,
  // the publish step is metadata-only: zero rows rewritten.
  // ---------------------------------------------------------------

  /** Create branch `name` at snapshot `gen` (default: main's live
    * generation). The fork base is recorded; fast-forward refuses if
    * main has moved past it. Idempotent on the same (name, gen) while
    * the branch is unadvanced.
    */
  def createBranch(root: String, name: String, gen: Option[Long] = None): Long =
    withCommitLock(Paths.get(root)) {
      validateRefName(name, "branch")
      val g = gen.getOrElse {
        val lg = liveGen(root)
        if (lg > 0L) lg
        else throw new IllegalArgumentException(
          s"no snapshots at $root to branch from")
      }
      require(Files.exists(Paths.get(root).resolve("_snapshots")
          .resolve(s"manifest-$g.json")),
        s"snapshot $g of $root does not exist (expired or never " +
          s"published); available: ${snapshots(root).mkString(",")}")
      // forking from another branch's commit would record a base that
      // is not main lineage: fast_forward's divergence check could then
      // never hold and would misreport "main diverged" — refuse at the
      // fixable point (code-review r19)
      require(!isBranchSnapshot(Paths.get(root), g),
        s"snapshot $g of $root is a BRANCH commit — branches fork from " +
          "main lineage (fast_forward the other branch first, or branch " +
          "from a main generation)")
      val cur = refs(root)
      cur.find(_.name == name) match {
        case Some(r) if r.kind == "branch" && r.gen == g && r.base == g => g
        case Some(r) if r.kind == "branch" => throw new IllegalArgumentException(
          s"branch $name already exists on $root (head ${r.gen}, " +
            s"base ${r.base}) — drop_branch it first")
        case Some(_) => throw new IllegalArgumentException(
          s"a tag named $name already exists on $root — " +
            "VERSION AS OF resolution would be ambiguous")
        case None =>
          writeRefs(Paths.get(root), cur :+ SnapRef(name, g, "branch", g))
          g
      }
    }

  /** Remove branch `name`; returns whether it existed. Its snapshots
    * (and any files only they reference) become vacuum-expirable.
    */
  def dropBranch(root: String, name: String): Boolean =
    withCommitLock(Paths.get(root)) {
      val cur = refs(root)
      val left = cur.filterNot(r => r.kind == "branch" && r.name == name)
      if (left.size == cur.size) false
      else { writeRefs(Paths.get(root), left); true }
    }

  /** The branch's head snapshot generation, or a loud error. */
  def branchHead(root: String, name: String): Long =
    branches(root).find(_.name == name).map(_.gen).getOrElse(
      throw new IllegalArgumentException(
        s"no branch named $name on $root — branches: " +
          branches(root).map(b => s"${b.name}->${b.gen}").mkString(",")))

  /** Publish `lines` as branch `name`'s next snapshot: stamp
    * `#g:`/`#t:`/`#br:`, archive under the next GLOBAL generation, and
    * advance the branch head in `_refs.json` — `manifest.json` is
    * untouched. Caller must hold the commit lock and have planned
    * against `expectedHead` (verified here; a concurrent branch commit
    * under another lock acquisition fails the CAS loudly).
    */
  private[sources] def publishBranch(root: Path, name: String,
      lines: Seq[String], expectedHead: Long): Long = {
    val cur = refs(root.toString)
    val br = cur.find(r => r.kind == "branch" && r.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"no branch named $name on $root — create it before writing " +
          "(CALL system.branch)"))
    if (br.gen != expectedHead)
      throw new java.util.ConcurrentModificationException(
        s"concurrent commit on branch $name of $root: planned against " +
          s"head $expectedHead but the branch is now at ${br.gen}")
    // branch instants advance monotonically ALONG THE BRANCH (main's
    // ledger never resolves them, so cross-lineage ordering is free)
    val prevTs = commitMillis(
      root.resolve("_snapshots").resolve(s"manifest-${br.gen}.json"))
    val ts = math.max(System.currentTimeMillis(), prevTs.getOrElse(0L) + 1L)
    val gen = nextGen(root)
    val stamped = lines.filterNot(l => l.startsWith("#t:") ||
      l.startsWith("#g:") || l.startsWith(BranchMark)) :+
      s"$BranchMark$name" :+ s"#g:$gen" :+ s"#t:$ts"
    val snaps = root.resolve("_snapshots")
    Files.createDirectories(snaps)
    val stmp = snaps.resolve(s"manifest-$gen.json.tmp")
    Files.write(stmp, stamped.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(stmp, snaps.resolve(s"manifest-$gen.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    recordHighWater(root, gen)
    writeRefs(root, cur.map(r =>
      if (r.kind == "branch" && r.name == name) r.copy(gen = gen) else r))
    gen
  }

  /** FAST-FORWARD publish (the WAP "publish" step): republish branch
    * `name`'s head state onto main as a new main generation. Refuses
    * when main has diverged from the branch's fork base — the audited
    * state was validated against THAT main, publishing over a moved
    * main would silently drop the interleaved commits (re-branch and
    * re-audit instead; this is Iceberg fast_forward's ancestor rule).
    * Metadata-only: the head's segments/files carry by reference.
    * Returns the new main generation; the branch stays, its base
    * re-anchored to the published generation (audit → publish → keep
    * writing → publish again composes).
    */
  def fastForward(root: String, name: String): Long =
    withCommitLock(Paths.get(root)) {
      val rootP = Paths.get(root)
      val cur = refs(root)
      val br = cur.find(r => r.kind == "branch" && r.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"no branch named $name on $root — branches: " +
            branches(root).map(b => s"${b.name}->${b.gen}").mkString(",")))
      val mainG = liveGen(root)
      if (br.gen == br.base) return mainG // nothing committed to the branch
      require(mainG == br.base,
        s"cannot fast-forward $root to branch $name: main is at " +
          s"generation $mainG but the branch forked from ${br.base} — " +
          "main diverged; drop_branch and re-branch from the current " +
          "state (publishing would drop main's interleaved commits)")
      val head = rootP.resolve("_snapshots").resolve(s"manifest-${br.gen}.json")
      val raw = Files.readAllLines(head).toArray(Array.empty[String]).toSeq
      require(raw.nonEmpty, s"branch $name head snapshot ${br.gen} is empty")
      // publish() strips the branch mark + stamps; segments carry by ref
      val newGen = publish(rootP, raw)
      // the branch's state now EQUALS main's: re-anchor head AND base to
      // the published generation, so re-running fast_forward is a no-op
      // and further branch commits build on the published snapshot
      writeRefs(rootP, refs(root).map(r =>
        if (r.kind == "branch" && r.name == name)
          r.copy(gen = newGen, base = newGen)
        else r))
      newGen
    }

  /** `rollback(table, generation)` (r19 continuation — the Iceberg
    * `rollback_to_snapshot` shape): re-point main's live state at a
    * RETAINED main-lineage snapshot by REPUBLISHING its content as a
    * NEW generation. History is preserved — the rolled-past commits
    * stay in the ledger, remain time-travelable, and age out through
    * ordinary retention; nothing is deleted here. Metadata-only: files
    * and segments carry by reference, exactly like [[fastForward]].
    * Refuses loudly when the target expired (vacuum) or is a branch
    * commit (branch state publishes through fast_forward, which also
    * checks divergence); rolling back to the current live generation
    * is an idempotent no-op rather than an empty commit.
    */
  def rollback(root: String, target: Long): Long =
    withCommitLock(Paths.get(root)) {
      val rootP = Paths.get(root)
      val cur = liveGen(root)
      if (target == cur) return cur
      val retainedMain = mainSnapshots(root)
      if (!retainedMain.contains(target)) {
        val branchHint =
          if (snapshots(root).contains(target))
            s" (generation $target is a branch commit — publish branch " +
              "state through fast_forward instead)"
          else ""
        throw new IllegalArgumentException(
          s"cannot roll back $root to generation $target — retained " +
            s"main-lineage generations: ${retainedMain.mkString(",")}" +
            branchHint)
      }
      val snap = rootP.resolve("_snapshots").resolve(s"manifest-$target.json")
      val raw = Files.readAllLines(snap).toArray(Array.empty[String]).toSeq
      require(raw.nonEmpty, s"snapshot $target of $root is empty")
      // SCHEMA GUARD: republishing a pre-evolution snapshot would
      // un-evolve the live schema and resurrect a cleared rename/drop
      // ledger — every reader fixed at the live schema (and the CDC
      // feed's forward-only evolution accumulation) would break.
      // Refuse loudly; data-only rollbacks (the operational case) pass.
      // Names + types only: the recorded DDL's NULLABILITY legitimately
      // drifts between write paths (DataFrame-inferred NOT NULL vs the
      // table-declared nullable) without any user-visible evolution.
      val live = Files.readAllLines(rootP.resolve("manifest.json"))
        .toArray(Array.empty[String]).toSeq
      def shape(lines: Seq[String]): Seq[(String, org.apache.spark.sql
          .types.DataType)] =
        lines.headOption.toSeq.flatMap(ddl => org.apache.spark.sql.types
          .StructType.fromDDL(ddl).fields.map(f => (f.name, f.dataType)))
      require(shape(raw) == shape(live) &&
        raw.filter(ManifestEvolution.isLine).toSet ==
          live.filter(ManifestEvolution.isLine).toSet,
        s"cannot roll back $root to generation $target — the table's " +
          "schema or rename/drop ledger changed since that snapshot; " +
          "rollback republishes DATA state only. Recreate the prior " +
          "schema with ALTER TABLE first, or read the old state via " +
          s"VERSION AS OF $target")
      publish(rootP, raw)
    }

  /** Snapshot-retention vacuum (the Iceberg `expire_snapshots` +
    * orphan-file cleanup pair): keep the newest `retainSnapshots`
    * snapshot manifests plus the live one, delete every data file none
    * of the retained states references, and expire the older snapshot
    * manifests so time travel can never resolve to deleted files.
    * Separate from [[compact]] on purpose: the atomic swap retires old
    * files LOGICALLY at once; physical deletion runs after whatever
    * read-grace / time-travel retention policy the deployment wants.
    * Returns the deleted data-file count (0 on re-run — idempotent).
    */
  def vacuum(root: String, retainSnapshots: Int = 1): Int =
      withCommitLock(Paths.get(root)) {
    val rootP = Paths.get(root)
    // under the commit lock (code-review r16): an unlocked vacuum could
    // compute its live set while a commit sits between segment write
    // and manifest swap, deleting the in-flight commit's files as
    // "orphans" and leaving the swapped manifest pointing at nothing
    val gens = snapshots(root)
    // TAGGED generations and BRANCH HEADS are retention anchors (r19):
    // their snapshots — and every file/segment they reference — survive
    // any retention bound until the ref is dropped. A branch's
    // INTERMEDIATE snapshots age out like any others; only the head is
    // the branch's contract.
    // main's LIVE generation anchors unconditionally: with an active
    // branch the global takeRight window can be all branch commits, and
    // expiring main's own head snapshot would break the CDC feed and
    // default tagging while the table itself reads fine (r19 branches)
    val anchored = (tags(root).map(_._2) ++ branches(root).map(_.gen)).toSet +
      liveGen(root)
    val retained = gens.takeRight(math.max(1, retainSnapshots)).toSet ++
      anchored.filter(gens.contains)
    val snapsDir = rootP.resolve("_snapshots")
    // retained states resolve segments: their data files stay live, and
    // so do the SEGMENT files they reference (segments expire with the
    // snapshots that reference them — the manifest-list retention rule)
    val retainedManifests = rootP.resolve("manifest.json") +:
      gens.filter(retained).map(g => snapsDir.resolve(s"manifest-$g.json"))
    val live = retainedManifests.flatMap { m =>
      resolvedManifestLines(rootP, m).map { lines =>
        // data files named by the state, plus the position-DELETE files
        // its `#pd:` lines reference (they live under data/ too — r17)
        lines.tail.filterNot(_.startsWith("#")) ++
          ManifestPosDeletes.of(lines.tail).map(_.delFile)
      }.getOrElse(Seq.empty)
    }.map(p => Paths.get(p).getFileName.toString).toSet
    val liveSegs = retainedManifests.flatMap { m =>
      if (!Files.exists(m)) Seq.empty
      else Files.readAllLines(m).toArray(Array.empty[String]).toSeq
        .filter(_.startsWith(SegPrefix)).map(segRefName)
    }.toSet
    // expire the non-retained snapshot manifests FIRST: a reader can
    // then never resolve a snapshot whose files this pass deletes
    gens.filterNot(retained).foreach { g =>
      Files.deleteIfExists(snapsDir.resolve(s"manifest-$g.json"))
    }
    def deleteOrphans(dir: Path, keep: String => Boolean): Int = {
      if (!Files.exists(dir)) return 0
      val orphans = {
        val s = Files.list(dir)
        try {
          val b = Array.newBuilder[Path]
          val it = s.iterator()
          while (it.hasNext) b += it.next()
          b.result()
        } finally s.close()
      }.filterNot(p => keep(p.getFileName.toString))
      orphans.foreach(Files.deleteIfExists(_))
      orphans.length
    }
    deleteOrphans(rootP.resolve("_segments"), liveSegs.contains)
    deleteOrphans(rootP.resolve("data"), live.contains)
  }

  /** ABANDONED-STAGING SWEEP (the Iceberg `remove_orphan_files` shape,
    * r19): a task that staged files and then died without reaching
    * commit OR abort (hard kill, lost executor) leaves them under
    * `_staging/` forever — invisible to every reader (only committed
    * manifests are read) but billed disk at 100 TB. Deletes staging
    * entries (and stray `.tmp` leftovers of interrupted metadata swaps)
    * older than `olderThanMs`; the age threshold is the protection for
    * writes staging RIGHT NOW (they hold no lock until commit), the
    * same contract as Iceberg's `older_than`. Committed data, segments,
    * snapshots, and refs are never candidates — this sweep only ever
    * looks at staging and `.tmp` names. Returns the deleted count.
    */
  def removeOrphans(root: String,
      olderThanMs: Long = 24L * 3600 * 1000): Int =
    withCommitLock(Paths.get(root)) {
      val rootP = Paths.get(root)
      val cutoff = System.currentTimeMillis() - math.max(0L, olderThanMs)
      var n = 0
      def sweep(dir: Path, eligible: Path => Boolean): Unit = {
        if (!Files.exists(dir)) return
        val s = Files.list(dir)
        try {
          val it = s.iterator()
          while (it.hasNext) {
            val p = it.next()
            if (Files.isRegularFile(p) && eligible(p) &&
                Files.getLastModifiedTime(p).toMillis < cutoff) {
              Files.deleteIfExists(p)
              n += 1
            }
          }
        } finally s.close()
      }
      sweep(rootP.resolve("_staging"), _ => true)
      sweep(rootP, _.getFileName.toString.endsWith(".tmp"))
      sweep(rootP.resolve("_snapshots"), _.getFileName.toString.endsWith(".tmp"))
      sweep(rootP.resolve("_segments"), _.getFileName.toString.endsWith(".tmp"))
      n
    }

  /** COPY-ON-WRITE MERGE (upsert): the keyed row-level operation next
    * to DELETE — rows of `updates` REPLACE current rows sharing their
    * key and new keys INSERT, in one distributed job: survivors =
    * current ANTI-JOIN update-keys (a broadcast-able key-set join, never
    * row-by-row), then survivors ∪ updates republish through the atomic
    * snapshot swap. This is the Iceberg/Delta copy-on-write MERGE shape;
    * the pre-merge generation stays time-travel readable until vacuum.
    *
    * PRUNED (VERDICT r14 Next #2): write amplification is no longer the
    * whole table — a file can contain a replaced row only if EVERY key
    * column's [min,max] intersects the update keys' range, so files
    * outside the key range carry into the new snapshot BY NAME,
    * unrewritten. The key range is one tiny aggregate over `updates`
    * (2·|keyCols| cells), never a collect of data.
    */
  def merge(spark: org.apache.spark.sql.SparkSession, root: String,
      updates: org.apache.spark.sql.DataFrame, keyCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col, max, min}
    val rootP = Paths.get(root)
    val baseGen = liveGen(root)
    val (schema, _) = readManifest(rootP).getOrElse(
      throw new IllegalArgumentException(s"no manifest at $root — nothing to merge"))
    val names = rawManifest(rootP).map(_._2).getOrElse(Seq.empty)
    val stats = fileStats(root)
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    // update-key envelope: one row of (min, max) per key column
    val aggs = keyCols.flatMap(k =>
      Seq(min(col(k)).as(s"mn_$k"), max(col(k)).as(s"mx_$k")))
    val bounds = updates.agg(aggs.head, aggs.tail: _*).collect().head
    def mayHoldKey(n: String): Boolean = stats.get(n).forall { fs =>
      keyCols.forall { k =>
        val lo = bounds.getAs[Any](s"mn_$k")
        val hi = bounds.getAs[Any](s"mx_$k")
        lo == null || hi == null ||
          ManifestMeta.mayMatch(
            org.apache.spark.sql.sources.And(
              org.apache.spark.sql.sources.GreaterThanOrEqual(k, lo),
              org.apache.spark.sql.sources.LessThanOrEqual(k, hi)),
            fs, types)
      }
    }
    val candidates = names.filter(mayHoldKey)
    val candPaths = candidates.map(n =>
      rootP.resolve("data").resolve(n).toString)
    // standing MoR tombstones AND position deletes apply to the
    // candidate read — a merge must not resurrect deleted rows
    val survivors = readDataFiles(spark, schema, candPaths, liveDeletes(rootP),
        livePosDeletes(rootP), liveAliases(rootP))
      .join(
        broadcast(updates.select(keyCols.map(col): _*).distinct()),
        keyCols, "left_anti")
    // the using-columns join moves key columns first: restore the
    // table's declared column order before republishing, or the merged
    // manifest's DDL would silently permute the schema
    val w0 = survivors.unionByName(updates)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root)
      .option("expectedGen", baseGen.toString)
    // LAYOUT-PRESERVING rewrite (ADVICE r15): replacement files must
    // keep the table's payload format and partition/sort layout, or one
    // selective MERGE silently demotes a partitioned parquet table to
    // unsorted JSON and drops its KeyGroupedPartitioning claim. The
    // layout is DERIVED from the committed state itself (names + stats),
    // so the helper needs no catalog handle.
    val fmt = derivedFormat(names)
    val allStats = ManifestSink.fileStats(root)
    val (pBy, oBy) = derivedLayout(names, allStats, schema)
    val bloomCols = derivedBloomCols(names, allStats)
    val w1 = w0.option("format", fmt)
    val w2 = if (pBy.nonEmpty) w1.option("partitionBy", pBy.mkString(",")) else w1
    val w3 = if (oBy.nonEmpty) w2.option("orderBy", oBy.mkString(",")) else w2
    val w4 = if (bloomCols.nonEmpty)
      w3.option("bloomFor", bloomCols.mkString(",")) else w3
    (if (candidates.nonEmpty)
       w4.option("replaceFiles", candidates.mkString(","))
     else w4).save()
  }

  /** Payload format a rewrite should use: parquet when every committed
    * file is parquet, else the inspectable JSON default (a mixed-format
    * table stays readable either way — the reader dispatches per file).
    */
  private[sources] def derivedFormat(names: Seq[String]): String =
    if (names.nonEmpty && names.forall(_.endsWith(".parquet"))) "parquet"
    else "json"

  /** Bloom columns a rewrite should re-opt-in: the columns every
    * committed file recorded a bloom for — a compaction or CoW rewrite
    * must not silently strip the table's point-lookup skipping
    * (code-review r16: rewrites were dropping blooms with no warning).
    */
  private[sources] def derivedBloomCols(names: Seq[String],
      stats: Map[String, ManifestMeta.FileStats]): Seq[String] = {
    if (names.isEmpty || !names.forall(stats.contains)) return Seq.empty
    val fss = names.map(stats)
    fss.head.cols.keys.toSeq.sorted.filter(c =>
      fss.forall(_.cols.get(c).exists(_.bloom.isDefined)))
  }

  /** (partitionBy, orderBy) a rewrite should redeclare, derived from the
    * committed files' OWN stats claims: the common `sorted` prefix every
    * file agrees on, split at the purity boundary — a sort column on
    * which every file is partition-pure (null-free, min==max) was a
    * partition/cluster key of the original write; the rest is in-file
    * ordering. Files without stats (or with no common claim) derive an
    * empty layout — the rewrite is then exactly as unordered as the
    * table already was.
    */
  private[sources] def derivedLayout(names: Seq[String],
      stats: Map[String, ManifestMeta.FileStats],
      schema: StructType): (Seq[String], Seq[String]) = {
    if (names.isEmpty || !names.forall(stats.contains)) return (Seq.empty, Seq.empty)
    val fss = names.map(stats)
    val common = fss.map(_.sorted).reduce { (a, b) =>
      a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1)
    }.filter(schema.fieldNames.contains)
    def pureEverywhere(c: String): Boolean = fss.forall(fs =>
      fs.cols.get(c).exists(s =>
        s.nulls == 0L && s.min.isDefined && s.min == s.max))
    val pBy = common.takeWhile(pureEverywhere)
    (pBy, common.drop(pBy.length))
  }

  /** MERGE-ON-READ UPSERT: updates APPEND as new files and the keys
    * they replace publish as a tombstone scoped to the PRE-commit files
    * — one atomic snapshot (the tombstone rides the same commit via the
    * `tombstoneFilter` write option, so a crash can never leave the
    * delete visible without the inserts). Write cost is O(updates) data
    * + O(keys) metadata; zero existing files rewrite. Driver-bounded by
    * `maxKeys` (the tombstone carries the literal key set — a big keyed
    * update belongs on the copy-on-write [[merge]], which is refused
    * loudly here, never silently degraded).
    */
  def mergeMoR(spark: org.apache.spark.sql.SparkSession, root: String,
      updates: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
      maxKeys: Int = 1024): Unit = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.sources.{And, EqualTo, Filter, In, Or}
    val rootP = Paths.get(root)
    // CAS base captured BEFORE planning (code-review r16): a concurrent
    // append of the same keys between this read and the commit must
    // fail the CAS, not get silently tombstoned — the tombstone-bearing
    // commit is row-replacing and gets the same conflict detection as
    // the copy-on-write merge
    val baseGen = liveGen(root)
    val (schema, _) = readManifest(rootP).getOrElse(
      throw new IllegalArgumentException(s"no manifest at $root — nothing to merge"))
    val keyRows = updates.select(keyCols.map(col): _*)
      .distinct().limit(maxKeys + 1).collect()
    if (keyRows.isEmpty) return // empty updates: a clean no-op
    require(keyRows.length <= maxKeys,
      s"MoR merge carries the key set in its tombstone and is bounded at " +
        s"$maxKeys keys — use the copy-on-write merge() for larger updates")
    require(keyRows.forall(r => (0 until keyCols.length).forall(!r.isNullAt(_))),
      "MoR merge keys must be non-null (a null key matches no row)")
    val pred: Filter =
      if (keyCols.length == 1) In(keyCols.head, keyRows.map(_.get(0)))
      else keyRows.map { r =>
        keyCols.zipWithIndex.map { case (c, i) =>
          EqualTo(c, r.get(i)): Filter }.reduce(And(_, _))
      }.reduce(Or(_, _))
    // the appended update files keep the table's bloom opt-in
    val names = rawManifest(rootP).map(_._2).getOrElse(Seq.empty)
    val blm = derivedBloomCols(names, fileStats(root))
    val w0 = updates.select(schema.fieldNames.map(col).toIndexedSeq: _*)
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", root)
      .option("expectedGen", baseGen.toString)
      .option("tombstoneFilter",
        ManifestMeta.encodeObject(ManifestDeletes.filterToJson(pred)))
    (if (blm.nonEmpty) w0.option("bloomFor", blm.mkString(",")) else w0).save()
  }

  /** v1 Filter → Column translation for [[ManifestTable.deleteWhere]] —
    * the supported predicate subset; None = refuse the delete cleanly.
    */
  private[sources] def filterToColumn(
      f: org.apache.spark.sql.sources.Filter): Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v) => Some(col(a) === lit(v))
      case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case GreaterThan(a, v) => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v) => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case IsNull(a) => Some(col(a).isNull)
      case IsNotNull(a) => Some(col(a).isNotNull)
      case StringStartsWith(a, v) => Some(col(a).startsWith(v))
      case And(l, r) =>
        for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc && rc
      case Or(l, r) =>
        for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc || rc
      case Not(c) => filterToColumn(c).map(!_)
      case _: AlwaysTrue => Some(lit(true))
      case _: AlwaysFalse => Some(lit(false))
      case _ => None
    }
  }

  /** Round-trip the nation dim through the two-phase-commit sink and
    * read back ONLY what the manifest published — any loss in the
    * staging/commit dance, the schema-generic serializer, or the
    * manifest swap breaks the match against the parquet source.
    */
  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(
    "q_dsv2_sink" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val root = graft.streaming.StreamQueries.fixtureDir("manifestsink", dir, "nation")
      val src = graft.Tables.nation(s, dir)
        .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("long").as("n_regionkey"))
      src.write.format("graft.sources.ManifestSink")
        .mode("overwrite").option("path", root).save()
      // snapshot read: schema + file list resolved from ONE manifest read
      readCommitted(s, root)
    }),

    // WRITE-SIDE LAYOUT (RequiresDistributionAndOrdering): the sink asks
    // for clustering on o_orderstatus and in-file ordering by
    // o_orderkey; Spark plans the exchange+sort (pinned in
    // ManifestSinkSpec: each status lands wholly in one file, files are
    // internally sorted). The readback through the manifest is
    // layout-invariant — the oracle proves the declared layout cost no
    // rows and changed none.
    "q_sink_clustered" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val root = graft.streaming.StreamQueries.fixtureDir("sinkclustered", dir, "orders")
      graft.Tables.orders(s, dir)
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_orderstatus"),
          org.apache.spark.sql.functions.expr(
            "CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        .write.format("graft.sources.ManifestSink")
        .mode("overwrite").option("path", root)
        .option("clusterBy", "o_orderstatus").option("orderBy", "o_orderkey")
        .save()
      readCommitted(s, root)
    }),

    // STREAMING FROM THE LAKE TABLE: three committed generations (three
    // INSERT-shaped appends) drain through the snapshot feed one
    // generation per micro-batch — every committed row delivered
    // exactly once across the change sets, accumulating to the full dim
    // (any duplicated or dropped snapshot diff breaks the match). The
    // readStream side goes through the SAME TableProvider — the sink is
    // now a full read/write/stream table.
    "q_stream_lake_feed" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.DataFrame
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_lake_feed_").toFile.getAbsolutePath
      def dim = graft.Tables.customer(s, dir)
        .select(col("c_custkey").cast("long").as("c_custkey"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"))
      Seq(col("c_custkey") % 3 === 0L, col("c_custkey") % 3 === 1L,
          col("c_custkey") % 3 === 2L)
        .foreach { slice =>
          dim.filter(slice).write.format("graft.sources.ManifestSink")
            .mode("append").option("path", tmp).save()
        }
      val q = s.readStream.format("graft.sources.ManifestSink")
        .option("path", tmp).load()
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), sum(col("bal_cents")).as("cents"))
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.write.mode("overwrite").parquet(s"$tmp/out")
        }
        .outputMode("complete")
        .option("checkpointLocation", s"$tmp/_checkpoint")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.schema("c_nationkey LONG, n LONG, cents LONG").parquet(s"$tmp/out")
    }),

    // SNAPSHOT TIME TRAVEL: two committed generations (a filtered dim,
    // then the full overwrite) read back AS OF their snapshots — the
    // historical read must see exactly the old state after the
    // overwrite replaced the live manifest. Generations are addressed
    // RELATIVELY (the last two published) so the content-keyed fixture
    // accumulating snapshots across harness runs never shifts the
    // result; the closing retention-2 vacuum bounds that accumulation
    // while keeping both generations this query reads.
    "q_sink_snapshot" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, lit}
      val root = graft.streaming.StreamQueries.fixtureDir("sinksnapshot", dir, "nation")
      def dim = graft.Tables.nation(s, dir)
        .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("long").as("n_regionkey"))
      dim.filter(col("n_regionkey") < 2L)
        .write.format("graft.sources.ManifestSink")
        .mode("overwrite").option("path", root).save()
      dim.write.format("graft.sources.ManifestSink")
        .mode("overwrite").option("path", root).save()
      val Seq(gOld, gNew) = snapshots(root).takeRight(2)
      val out = readSnapshot(s, root, gOld).withColumn("gen", lit(1L))
        .unionByName(readSnapshot(s, root, gNew).withColumn("gen", lit(2L)))
        .localCheckpoint() // materialize BEFORE the retention vacuum below
      vacuum(root, retainSnapshots = 2)
      out
    }),

    // PARQUET PAYLOAD (VERDICT r14 Next #1): the same dim through the
    // same two-phase commit protocol, but the data files are columnar
    // snappy parquet — the 100 TB format. The oracle proves the format
    // swap is invisible to semantics (row-exact vs the source); the
    // column-chunk-skipping read is pinned in ManifestSinkSpec.
    "q_sink_parquet" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val root = graft.streaming.StreamQueries.fixtureDir("sinkparquet", dir, "customer")
      graft.Tables.customer(s, dir)
        .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_acctbal").cast("double").as("c_acctbal"))
        .write.format("graft.sources.ManifestSink")
        .mode("overwrite").option("path", root)
        .option("format", "parquet")
        .option("clusterBy", "c_nationkey").option("orderBy", "c_custkey")
        .save()
      readCommitted(s, root)
    }),

    // write-many, compact-to-one, vacuum, read back through the manifest:
    // the full maintenance cycle under the oracle — compaction must be
    // row-exact (pre/post identity vs the parquet source) and the
    // readback must see ONLY the compacted generation
    "q_sink_compact" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val root = graft.streaming.StreamQueries.fixtureDir("sinkcompact", dir, "customer")
      val src = graft.Tables.customer(s, dir)
        .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_acctbal").cast("double").as("c_acctbal"))
      // 4 partitions -> 4 committed files: real multi-file input
      src.repartition(4).write.format("graft.sources.ManifestSink")
        .mode("overwrite").option("path", root).save()
      compact(s, root)
      vacuum(root)
      readCommitted(s, root)
    }),

    // PARTITION-PRESERVING compaction: two appends leave every nation
    // value spanning two files; the maintenance pass rewrites through
    // the same clustered write + per-value roll as any partitioned
    // INSERT, restoring one pure file per value (layout-claim return
    // pinned in LakeTableSpec) — and the oracle proves the rewrite is
    // row-exact vs the source.
    "q_sink_compact_part" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val root = graft.streaming.StreamQueries.fixtureDir("sinkcompactpart", dir, "customer")
      def src = graft.Tables.customer(s, dir)
        .select(col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_custkey").cast("long").as("c_custkey"), col("c_mktsegment"))
      Seq(col("c_custkey") % 2 === 0L, col("c_custkey") % 2 === 1L)
        .zipWithIndex.foreach { case (slice, i) =>
          src.filter(slice).write.format("graft.sources.ManifestSink")
            .mode(if (i == 0) "overwrite" else "append")
            .option("path", root).option("format", "parquet")
            .option("partitionBy", "c_nationkey").option("orderBy", "c_custkey")
            .save()
        }
      compact(s, root, partitionBy = Seq("c_nationkey"),
        orderBy = Seq("c_custkey"))
      vacuum(root)
      readCommitted(s, root)
    }),

    // END-TO-END custom-connector streaming: the DSv2 synthetic SOURCE
    // drains through the DSv2 manifest SINK's StreamingWrite face in 3
    // admission-controlled epochs (60000 ids / 20000 per batch), each
    // epoch publishing via the idempotent manifest append; readback goes
    // through the committed manifest only, and the rollup must land
    // exactly where one batch pass over the full id domain would —
    // any epoch lost, doubled, or partially published breaks the match.
    "q_stream_dsv2_sink" -> ((s, _) => {
      import org.apache.spark.sql.functions._
      val root = java.nio.file.Files
        .createTempDirectory("graft_dsv2_ssink_").toFile.getAbsolutePath
      val q = s.readStream.format("graft.sources.SynthDataSource")
        .option("rows", "60000").option("slices", "8")
        .option("rowsPerBatch", "20000").load()
        .select(col("id"), col("channel"), col("amount_cents"))
        .writeStream.format("graft.sources.ManifestSink")
        .option("path", root)
        .option("checkpointLocation", s"$root/_checkpoint")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      readCommitted(s, root)
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n"), sum(col("amount_cents")).as("cents"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_dsv2_sink" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        | CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation""".stripMargin,

    // three appended change sets must accumulate to exactly the full dim
    "q_stream_lake_feed" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM customer GROUP BY 1""".stripMargin,

    // the as-of read of generation 1 must equal the filtered write that
    // produced it, even though generation 2 has since replaced it
    "q_sink_snapshot" ->
      """SELECT CAST(1 AS BIGINT) AS gen, CAST(n_nationkey AS BIGINT) AS n_nationkey,
        | n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation WHERE n_regionkey < 2
        |UNION ALL
        |SELECT CAST(2 AS BIGINT) AS gen, CAST(n_nationkey AS BIGINT) AS n_nationkey,
        | n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM nation""".stripMargin,

    // the declared write layout must not change the rows
    "q_sink_clustered" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderstatus,
        | CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders""".stripMargin,

    // the parquet payload is row-exact vs the source (same oracle shape
    // as the JSON sink rows — the format must be invisible)
    "q_sink_parquet" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        | CAST(c_nationkey AS BIGINT) AS c_nationkey,
        | CAST(c_acctbal AS DOUBLE) AS c_acctbal
        |FROM customer""".stripMargin,

    // compaction is row-exact: the compacted single-file table must
    // still equal the parquet source
    "q_sink_compact" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
        | CAST(c_nationkey AS BIGINT) AS c_nationkey,
        | CAST(c_acctbal AS DOUBLE) AS c_acctbal
        |FROM customer""".stripMargin,

    // the partition-preserving maintenance rewrite is row-exact
    "q_sink_compact_part" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        | CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment
        |FROM customer""".stripMargin,

    // multi-epoch append through the streaming manifest must equal one
    // pass over the full generated id domain
    "q_stream_dsv2_sink" ->
      s"""WITH g AS (SELECT i AS id, ${SynthDataSource.oracleCells("i")}
         |  FROM (SELECT unnest(generate_series(0, 59999)) AS i) t)
         |SELECT channel, CAST(count(*) AS BIGINT) AS n,
         | CAST(sum(amount_cents) AS BIGINT) AS cents
         |FROM g GROUP BY channel""".stripMargin
  )
}

class ManifestTable(path: String, schema: StructType,
    carryEpochs: Set[Long] = Set.empty,
    clusterBy: Seq[String] = Seq.empty, orderBy: Seq[String] = Seq.empty,
    partitionBy: Seq[String] = Seq.empty, format: String = "json",
    replaceFiles: Seq[String] = Seq.empty,
    snapshotGen: Option[Long] = None,
    expectedGen: Option[Long] = None,
    deleteMode: String = "cow",
    tombstoneFilter: Option[String] = None,
    bloomFor: Seq[String] = Seq.empty,
    targetFileBytes: Long = 0L,
    rowGroupBytes: Long = 0L,
    splitConf: SplitConf = SplitConf.Default,
    /** INTERNAL rewrite plumbing (r19): `zorderClaim` stamps each
      * staged file's stats line with the z-order column list; with
      * `layoutProvided` the caller promises rows already arrive
      * clustered+ordered and the write declares no required
      * distribution (the partition-value roll still enforces purity —
      * rolling at every key boundary is arrival-order-independent);
      * `sortedClaim` overrides the recorded sort claim for
      * layout-provided writes (the default sources++orderBy claim
      * would be FALSE when rows are pre-sorted by something else).
      */
    zorderClaim: Seq[String] = Seq.empty,
    sortedClaim: Seq[String] = Seq.empty,
    layoutProvided: Boolean = false,
    /** Catalog-declared table properties, surfaced through
      * `SHOW TBLPROPERTIES` (r19).
      */
    tableProps: Map[String, String] = Map.empty,
    /** True when this table instance was served by [[GraftCatalog]]
      * (r19 SPJ): only then can a write's required distribution name
      * TRANSFORM expressions — Spark resolves them through the owning
      * catalog's FunctionCatalog face, which a path-based
      * (`.format(...)`) relation does not carry.
      */
    catalogOwned: Boolean = false)
    extends Table with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  /** SQL `UPDATE` / `MERGE INTO` / group-routed `DELETE` (VERDICT r16
    * Next #2): the copy-on-write row-level operation — candidate files
    * prune via stats, runtime group filtering narrows to matched
    * files, the write replaces exactly the scanned set in one
    * CAS-protected snapshot. Metadata-only DELETE still wins when
    * canDeleteWhere accepts (Spark's OptimizeMetadataOnlyDeleteFromTable),
    * so MoR tables keep their tombstone DELETE path.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo):
      org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    if (snapshotGen.isDefined) throw new UnsupportedOperationException(
      s"table pinned VERSION AS OF ${snapshotGen.get} is read-only")
    // deleteMode 'mor' → the DELTA-based operation: position deletes +
    // appended inserts, zero data files rewritten; else copy-on-write
    if (deleteMode == "mor")
      new ManifestMorRowLevelBuilder(path, schema, info.command(),
        bloomFor, targetFileBytes, rowGroupBytes, splitConf, partitionBy)
    else
      new ManifestRowLevelBuilder(path, schema, info.command(),
        clusterBy, orderBy, partitionBy, format, bloomFor, targetFileBytes,
        rowGroupBytes, splitConf)
  }
  override def name(): String =
    s"manifest($path${snapshotGen.map(g => s"@$g").getOrElse("")})"

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    tableProps.foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** LINEAGE metadata columns (`SELECT k, _file FROM t`): `_file` = the
    * committed file a row came from, `_epoch` = the streaming epoch that
    * committed it (-1 for batch-written files) — the row-provenance
    * surface every lake debugging/backfill workflow leans on. Served by
    * the reader for free (it knows its partition's file), never stored.
    */
  override def metadataColumns():
      Array[org.apache.spark.sql.connector.catalog.MetadataColumn] = Array(
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_file"
      override def dataType(): org.apache.spark.sql.types.DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "committed data file this row came from"
    },
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_epoch"
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String =
        "streaming epoch that committed this row (-1 for batch writes)"
    },
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_pos"
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String =
        "physical row position within this row's committed file (the " +
          "position-delete key; serving it disables parquet-level skipping)"
    })

  /** DELETE FROM support (the row-level-operations tier): the condition
    * arrives as v1 filters; the rewrite is a DISTRIBUTED Spark job —
    * read the committed state, keep the non-matching rows, republish
    * through the same atomic snapshot swap. The delete is therefore a
    * new SNAPSHOT: the pre-delete generation stays time-travel readable
    * until a retention vacuum expires it (a GDPR purge = delete + full
    * vacuum). Filters this sink can't translate are REFUSED in
    * canDeleteWhere — Spark then raises a clean unsupported error
    * instead of a wrong partial delete.
    */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(ManifestSink.filterToColumn(_).isDefined)

  /** PRUNED copy-on-write (VERDICT r14 Next #2): only files whose stats
    * say they MAY contain a matching row are rewritten; every other
    * committed file carries into the new snapshot BY NAME, unrewritten
    * (spec-pinned). At 100 TB a selective DELETE touches the handful of
    * files holding matches, not the table.
    */
  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    // MERGE-ON-READ mode (table OPTION deleteMode 'mor'): publish a
    // predicate tombstone — O(predicate) metadata, zero data rewrite;
    // the scan filters row-level and compaction folds it later
    if (deleteMode == "mor") {
      ManifestSink.deleteWhereMoR(path, filters)
      return
    }
    val spark = org.apache.spark.sql.SparkSession.active
    val rootP = Paths.get(path)
    // optimistic-concurrency base: the generation the candidate reads
    // below run against (captured FIRST — an interleaved commit then
    // fails the CAS rather than racing the reads)
    val baseGen = ManifestSink.liveGen(path)
    val names = ManifestSink.rawManifest(rootP).map(_._2).getOrElse(Seq.empty)
    val stats = ManifestSink.fileStats(path)
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    // the DELETE matches a row iff ALL filters hold — a file with stats
    // is a rewrite candidate only if every filter may match in it
    val candidates = names.filter { n =>
      stats.get(n).forall(fs =>
        filters.forall(ManifestMeta.mayMatch(_, fs, types)))
    }
    if (candidates.isEmpty) return // no file can hold a match: no-op
    // mirror deleteWhereMoR (ADVICE r16): an untranslatable filter must
    // refuse LOUDLY — flatMap-dropping one would WIDEN the delete (with
    // a single untranslatable filter, cond degenerates to lit(true) and
    // every row of the candidate files is deleted). canDeleteWhere
    // already screens SQL-path deletes; this guards direct callers.
    require(filters.forall(ManifestSink.filterToColumn(_).isDefined),
      s"unsupported CoW delete predicate: ${filters.mkString(", ")}")
    val cond = filters.flatMap(ManifestSink.filterToColumn(_))
      .reduceOption(_ && _).getOrElse(lit(true))
    // SQL DELETE keeps rows whose predicate is FALSE or UNKNOWN — a
    // plain not(cond) would silently also delete every row where the
    // predicate evaluates to NULL (ADVICE r14): keep on NOT TRUE.
    val candPaths = candidates.map(n =>
      rootP.resolve("data").resolve(n).toString)
    // LAYOUT-PRESERVING rewrite (ADVICE r15): replacement files keep the
    // table's declared format and partition/sort layout; a table
    // attached without declared options falls back to the layout its
    // committed stats prove (same derivation as merge) — either way a
    // selective DELETE can't demote the table's purity/ordering claims.
    val fmt = if (format != "json") format
              else ManifestSink.derivedFormat(names)
    val (dp, dob) = ManifestSink.derivedLayout(names, stats, schema)
    val pBy = if (partitionBy.nonEmpty) partitionBy else dp
    val oBy = if (orderBy.nonEmpty) orderBy else dob
    // blooms survive the rewrite too: declared columns win, else the
    // columns every committed file blooms (code-review r16)
    val blm = if (bloomFor.nonEmpty) bloomFor
              else ManifestSink.derivedBloomCols(names, stats)
    val w0 = ManifestSink.readDataFiles(spark, schema, candPaths,
        ManifestSink.liveDeletes(rootP), ManifestSink.livePosDeletes(rootP),
        ManifestSink.liveAliases(rootP))
      .filter(coalesce(not(cond), lit(true)))
      .write.format("graft.sources.ManifestSink")
      .mode("append").option("path", path)
      .option("format", fmt)
      .option("expectedGen", baseGen.toString)
      .option("replaceFiles", candidates.mkString(","))
    val w1 = if (pBy.nonEmpty) w0.option("partitionBy", pBy.mkString(",")) else w0
    val w2 = if (oBy.nonEmpty) w1.option("orderBy", oBy.mkString(",")) else w1
    val w3 = if (blm.nonEmpty) w2.option("bloomFor", blm.mkString(",")) else w2
    w3.save()
  }
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    if (snapshotGen.isDefined) // a pinned historical read is READ-ONLY
      util.EnumSet.of(TableCapability.BATCH_READ)
    else util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap):
      org.apache.spark.sql.connector.read.ScanBuilder =
    new ManifestScanBuilder(path, schema, partitionBy, snapshotGen, splitConf)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (snapshotGen.isDefined) throw new UnsupportedOperationException(
      s"table pinned VERSION AS OF ${snapshotGen.get} is read-only")
    // WRITE-AUDIT-PUBLISH (r19 branches): `.option("branch", name)` on
    // the write targets the named branch's lineage — the commit reads
    // its prior state from the BRANCH HEAD's archived snapshot and
    // publishes a `#br:`-marked snapshot advancing only the branch ref;
    // main (`manifest.json`) never moves until system.fast_forward.
    val branchOpt = Option(info.options.get("branch")).map(_.trim)
      .filter(_.nonEmpty)
    branchOpt.foreach(b => ManifestSink.branchHead(path, b)) // exists, loudly
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
      // APPEND (plain build / INSERT INTO) adds this job's files to the
      // manifest; TRUNCATE (save-mode overwrite / INSERT OVERWRITE)
      // replaces the file list — both publish through the same atomic
      // snapshot swap
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write =
        // OPTIMISTIC CONCURRENCY base: the generation this write was
        // planned against — an explicit `expectedGen` (DELETE/MERGE/
        // compaction pass the generation their candidate reads used),
        // else the live main generation at write start; a branch write
        // bases on the BRANCH HEAD it was planned against
        new ManifestWrite(path, info.schema(), carryEpochs, clusterBy, orderBy,
          replace, partitionBy, format, replaceFiles,
          baseGen = branchOpt.map(ManifestSink.branchHead(path, _))
            .orElse(expectedGen)
            .getOrElse(ManifestSink.liveGen(path)),
          tombstoneFilter = tombstoneFilter, bloomFor = bloomFor,
          targetFileBytes = targetFileBytes, rowGroupBytes = rowGroupBytes,
          zorderClaim = zorderClaim, sortedClaim = sortedClaim,
          layoutProvided = layoutProvided, branch = branchOpt,
          catalogOwned = catalogOwned)
    }
  }
}

/** The sink's Write face. With `clusterBy`/`orderBy` set it implements
  * `RequiresDistributionAndOrdering` — the WRITE-side layout contract
  * (the counterpart of the source's SupportsReportPartitioning): the
  * SINK declares the layout it wants and SPARK plans the exchange/sort
  * to deliver it, exactly how Iceberg requests its partition/sort-order
  * distribution. At 100 TB this is what keeps a clustered table's files
  * cluster-pure (one key set per file -> file-level pruning works) and
  * sorted (zone maps / min-max skipping work) without every writer
  * hand-rolling a repartition+sortWithinPartitions.
  */
class ManifestWrite(path: String, schema: StructType,
    carryEpochs: Set[Long] = Set.empty,
    clusterBy: Seq[String] = Seq.empty, orderBy: Seq[String] = Seq.empty,
    replace: Boolean = true,
    partitionBy: Seq[String] = Seq.empty, format: String = "json",
    replaceFiles: Seq[String] = Seq.empty, baseGen: Long = 0L,
    tombstoneFilter: Option[String] = None,
    bloomFor: Seq[String] = Seq.empty, targetFileBytes: Long = 0L,
    rowGroupBytes: Long = 0L,
    /** LATE-BOUND replaced-file set (row-level operations): resolved at
      * COMMIT, after runtime group filtering narrowed the scan.
      */
    replaceFilesF: () => Seq[String] = null,
    zorderClaim: Seq[String] = Seq.empty,
    sortedClaim: Seq[String] = Seq.empty,
    layoutProvided: Boolean = false,
    /** Target branch (r19 WAP): the commit advances this branch's head
      * instead of main. Batch-only — the streaming sink's epoch replay
      * ledger is a main-lineage contract.
      */
    branch: Option[String] = None,
    catalogOwned: Boolean = false)
    extends Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}

  /** Partition columns cluster FIRST (each value must land wholly in
    * one task so the writer's file-roll yields partition-PURE files),
    * then the explicit cluster keys. With `layoutProvided` the caller
    * has already arranged the frame (the z-order-within-partitions
    * rewrite sorts by a computed curve key no column list can declare)
    * — declaring a requirement here would let Spark re-sort by the
    * partition prefix alone and scramble the curve order.
    */
  /** Partition SPECS may be transforms (r19): Spark's exchange/sort
    * plan over the SOURCE columns — clustering equal source values
    * co-locates equal transform values for free, and the writer's
    * roll/keyed-map on the transform key enforces purity regardless.
    */
  private val writeSpecs: Seq[PartitionTransforms.Spec] =
    partitionBy.map(PartitionTransforms.parse)
  private val partSources: Seq[String] = writeSpecs.map(_.source)

  /** A catalog-owned write on a TRANSFORM-partitioned table clusters by
    * the transform expressions themselves (r19): Spark shuffles rows by
    * the bucket/day VALUE, so one partition value lands wholly in one
    * task and a commit stages at most one file per present value — file
    * count bounded by the transform's cardinality (e.g. the bucket
    * modulus), not tasks × values. Source-column clustering (the
    * fallback for path-based writes, whose relation carries no
    * FunctionCatalog to resolve the transforms) stays CORRECT — the
    * keyed writer enforces purity regardless — but stages one file per
    * (task, value) pair, which at 1000 tasks × 256 buckets is 256k tiny
    * files per append.
    */
  override def requiredDistribution(): Distribution = {
    if (layoutProvided) return Distributions.unspecified()
    val exprs: Seq[org.apache.spark.sql.connector.expressions.Expression] =
      if (catalogOwned && writeSpecs.exists(!_.isInstanceOf[PartitionTransforms.Identity]))
        writeSpecs.map(PartitionTransforms.v2Expression) ++
          clusterBy.filterNot(partSources.contains).map(Expressions.identity)
      else (partSources ++ clusterBy).distinct.map(c =>
        Expressions.identity(c):
          org.apache.spark.sql.connector.expressions.Expression)
    if (exprs.isEmpty) Distributions.unspecified()
    else Distributions.clustered(exprs.toArray)
  }

  /** Partition keys, then cluster keys, then the explicit in-file order
    * — rows of one partition/cluster land contiguous AND internally
    * sorted in each task's file (and the writer rolls a new file at
    * every partition-value boundary, which this ordering makes a single
    * forward pass).
    */
  override def requiredOrdering(): Array[SortOrder] =
    if (layoutProvided) Array.empty
    else (partSources ++ clusterBy ++ orderBy).distinct
      .map(c => Expressions.sort(Expressions.column(c), SortDirection.ASCENDING))
      .toArray

  /** The sort-column list each staged file's stats line records — what
    * the read side's ordering report stands on. SOURCE columns, never
    * transform renderings: the claim names real columns, and it stays
    * true on the keyed-writer path too (a keyed file's rows are a
    * subsequence of the task's source-sorted stream). A layout-provided
    * caller supplies its own claim (or none): the default would be
    * FALSE for rows pre-arranged by a computed key.
    */
  private def sortedCols: Seq[String] =
    if (layoutProvided) sortedClaim
    else (partSources ++ clusterBy ++ orderBy).distinct

  override def toBatch: BatchWrite =
    new ManifestBatchWrite(path, schema, carryEpochs, replace,
      format, partitionBy, sortedCols, replaceFiles, baseGen, tombstoneFilter,
      bloomFor, targetFileBytes, rowGroupBytes, replaceFilesF, zorderClaim,
      branch)
  override def toStreaming: StreamingWrite = {
    require(branch.isEmpty,
      "the streaming sink cannot target a branch — its epoch replay " +
        "ledger is a main-lineage contract (write batch to the branch, " +
        "or stream to a staging table and fast-forward after audit)")
    new ManifestStreamingWrite(path, schema, format, sortedCols, bloomFor,
      targetFileBytes, rowGroupBytes)
  }
}

/** One staged file + its ready-to-publish `#s:` stats line. */
case class StagedEntry(name: String, statsLine: String)

/** A task's commit message: every file it staged (the partition-aware
  * writer rolls a new file per partition value, so one task can stage
  * many).
  */
case class StagedFileSet(files: Seq[StagedEntry]) extends WriterCommitMessage

class ManifestBatchWrite(path: String, schema: StructType,
    carryEpochs: Set[Long] = Set.empty, replace: Boolean = true,
    format: String = "json", partitionBy: Seq[String] = Seq.empty,
    sortedCols: Seq[String] = Seq.empty,
    replaceFiles: Seq[String] = Seq.empty, baseGen: Long = -1L,
    tombstoneFilter: Option[String] = None,
    bloomFor: Seq[String] = Seq.empty, targetFileBytes: Long = 0L,
    rowGroupBytes: Long = 0L,
    replaceFilesF: () => Seq[String] = null,
    zorderClaim: Seq[String] = Seq.empty,
    branch: Option[String] = None)
    extends BatchWrite {
  /** Per-JOB name token: staged/committed file names from different
    * write jobs can never collide, so a newly published file can never
    * REPLACE a still-manifest-referenced (or orphaned-but-still-being-
    * read) file from an earlier job — the invariant compaction's
    * swap-then-vacuum isolation stands on.
    */
  private val jobToken = util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ManifestWriterFactory(path, schema, jobToken, format, partitionBy,
      sortedCols, bloomFor, targetFileBytes, rowGroupBytes, zorderClaim)

  /** DRIVER-side publish: staged → data/, then the manifest LAST via an
    * atomic temp-file move — the linearization point of the whole job.
    * This commit's files + stats land in ONE new immutable SEGMENT; the
    * published list is prior refs/inline lines (carried untouched) plus
    * the new segment's ref — an append writes O(batch) metadata bytes,
    * never O(table). Carried epoch ids (compaction) append as `#e:`
    * ledger lines. With `replaceFiles` set (pruned DELETE/MERGE), the
    * named prior files drop: inline lines filter directly, and only the
    * segments actually HOLDING a replaced file rewrite (pruned, minus
    * the replaced names and their stats) — every other segment carries
    * by reference; epoch ids of replaced `e<id>-` files move into `#e:`
    * ledger lines so streaming replay detection survives the rewrite.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    ManifestSink.withCommitLock(Paths.get(path)) {
    val root = Paths.get(path)
    // late-bound replaced set (row-level operations): resolved ONCE,
    // here, after runtime group filtering narrowed the scan
    val replacing: Seq[String] =
      if (replaceFilesF != null) replaceFilesF() else replaceFiles
    // OPTIMISTIC CONCURRENCY (VERDICT r15 Next #4), checked BEFORE any
    // state moves so a losing commit leaves only staged files (which
    // Spark's abort then deletes — the table never tears): if the live
    // generation moved past this write's base, a concurrent commit
    // landed. APPEND-shaped commits proceed — their file sets are
    // disjoint by job token and the locked read-modify-publish below
    // re-reads the CURRENT prior list, so disjoint appends merge
    // cleanly. REPLACE-shaped commits (overwrite, DELETE/MERGE
    // rewrites, compaction) were planned against a snapshot that no
    // longer exists — they fail LOUDLY; silently publishing would drop
    // the interleaved commit's rows.
    // tombstone-carrying commits (MoR upsert) are row-REPLACING: they
    // get the same stale-snapshot conflict detection as overwrites and
    // rewrites (code-review r16), not append-grade none. A BRANCH
    // commit's lineage head is the branch ref, not main — its CAS runs
    // against the CURRENT branch head read under this lock.
    val branchHeadNow: Option[Long] = branch.map { b =>
      require(replacing.isEmpty && replaceFilesF == null &&
          tombstoneFilter.isEmpty,
        "row-level operations target main — branch writes are " +
          "append/overwrite shaped (audit on the branch, publish, then " +
          "run DML on main)")
      ManifestSink.branchHead(path, b)
    }
    if (baseGen >= 0L &&
        (replace || replacing.nonEmpty || tombstoneFilter.isDefined)) {
      val liveGen = branchHeadNow.getOrElse(ManifestSink.liveGen(path))
      if (liveGen != baseGen) throw new java.util.ConcurrentModificationException(
        s"concurrent commit on $path${branch.fold("")(b => s" (branch $b)")}: " +
          s"this ${if (replace) "overwrite" else "row-level rewrite"} was planned " +
          s"against generation $baseGen but the ${branch.fold("table")(_ => "branch")} " +
          s"is now at $liveGen — re-run the operation against the current snapshot")
    }
    // misuse checks fire BEFORE any staged file moves (code-review
    // r16): failing after the moves would orphan data files that only a
    // vacuum could reclaim
    require(tombstoneFilter.isEmpty || !replace,
      "tombstoneFilter composes with append commits only")
    val data = root.resolve("data")
    Files.createDirectories(data)
    val staged = messages.iterator
      .flatMap(_.asInstanceOf[StagedFileSet].files).toSeq.sortBy(_.name)
    staged.foreach { e =>
      Files.move(root.resolve("_staging").resolve(e.name), data.resolve(e.name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // append keeps the prior list (refs carry unresolved); replace
    // starts fresh — either way ONE atomic snapshot publish. A branch
    // commit's prior state is its branch HEAD's archived snapshot.
    val replaced = replacing.toSet
    val rawPrior =
      if (replace) Seq.empty
      else branchHeadNow match {
        case Some(h) =>
          val m = root.resolve("_snapshots").resolve(s"manifest-$h.json")
          // the head is vacuum-anchored, so absence means OUT-OF-BAND
          // damage — refuse loudly; treating it as an empty table would
          // silently truncate the branch (and later main, via
          // fast_forward) — code-review r19
          if (!Files.exists(m)) throw new IllegalStateException(
            s"branch ${branch.get} of $path points at snapshot $h but " +
              s"$m does not exist — the head was deleted out-of-band " +
              "(vacuum anchors branch heads); refusing to publish a " +
              "truncated branch state")
          ManifestSink.rawListLinesAt(m)
        case None => ManifestSink.rawListLines(root)
      }
    // a line of a REPLACED file (its name or its stats) must drop. A
    // DAMAGED stats line must degrade (keep it — statsOf already drops
    // unparseable lines on read), never brick the commit (ADVICE r15).
    def keepLine(l: String): Boolean =
      if (l.startsWith("#"))
        !(ManifestMeta.isStatsLine(l) &&
          scala.util.Try(ManifestMeta.parseStatsLine(l)._1)
            .toOption.exists(replaced.contains))
      else !replaced.contains(l)
    var rewriteSeq = 0
    val prior = rawPrior.flatMap { l =>
      if (l.startsWith(ManifestSink.SegPrefix)) {
        val segName = ManifestSink.segRefName(l)
        lazy val lines = ManifestSink.segmentLines(root, segName)
        if (replaced.isEmpty || lines.forall(keepLine)) Seq(l) // carry by ref
        else {
          val kept = lines.filter(keepLine)
          rewriteSeq += 1
          if (kept.exists(!_.startsWith("#")))
            Seq(ManifestSink.writeSegment(root, s"$jobToken-rw$rewriteSeq", kept))
          else Seq.empty // every file of the segment was replaced
        }
      } else if (ManifestDeletes.isDeleteLine(l) && replaced.nonEmpty) {
        // a tombstone's file list prunes the replaced names (their
        // rewritten successors were read with the tombstone APPLIED);
        // a tombstone emptied of files has fully materialized — drop it
        val t = ManifestDeletes.parseLine(l).get
        val left = t.files -- replaced
        if (left.isEmpty) Seq.empty
        else if (left == t.files) Seq(l)
        else Seq(ManifestDeletes.line(t.copy(files = left)))
      } else if (ManifestPosDeletes.isLine(l) && replaced.nonEmpty) {
        // position deletes prune exactly like predicate tombstones; an
        // emptied scope drops the line and its delete file becomes a
        // vacuum-reclaimable orphan (r17)
        val pd = ManifestPosDeletes.parseLine(l).get
        val left = pd.files -- replaced
        if (left.isEmpty) Seq.empty
        else if (left == pd.files) Seq(l)
        else Seq(ManifestPosDeletes.line(pd.copy(files = left)))
      } else if (keepLine(l)) Seq(l)
      else Seq.empty
    }
    // a replaced streaming file's epoch must stay committed: carry it
    // as a ledger line (idempotent against lines already present)
    val alreadyLedgered = prior.filter(_.startsWith("#e:")).toSet
    val replacedEpochs = replacing.flatMap { n =>
      if (n.startsWith("e")) n.drop(1).takeWhile(_ != '-').toLongOption else None
    }.map(e => s"#e:$e").distinct.filterNot(alreadyLedgered)
    val ledger = carryEpochs.toSeq.sorted.map(e => s"#e:$e")
    val segRef =
      if (staged.isEmpty) Seq.empty
      else Seq(ManifestSink.writeSegment(root, jobToken,
        staged.map(_.name) ++ staged.map(_.statsLine)))
    // ATOMIC MoR UPSERT (mergeMoR): the tombstone for the replaced keys
    // publishes IN THIS COMMIT, scoped to the PRE-commit files (never
    // this job's own staged updates) — delete and insert are one
    // snapshot, a crash can't expose one without the other
    val tombstoneLine: Seq[String] = tombstoneFilter match {
      case None => Seq.empty
      case Some(json) =>
        val f = ManifestDeletes.filterFromJson(
          ManifestMeta.parse(json).asInstanceOf[Map[String, Any]])
        // one resolution: names + stats both come from the rawPrior
        // lines already read above (code-review r16 — the commit
        // critical section was resolving the manifest three times)
        val resolved = ManifestSink.resolveLines(root, rawPrior)
        val priorNames = resolved.filterNot(_.startsWith("#"))
        val p2cEvo = ManifestEvolution.priorToCurrent(resolved)
        val stats = ManifestMeta.statsOf(resolved.filter(_.startsWith("#")))
          .map { case (n, fs) => n -> ManifestEvolution.remapStats(fs, p2cEvo) }
        val types = schema.fields.map(fd => fd.name -> fd.dataType).toMap
        val cands = priorNames.filter(n =>
          stats.get(n).forall(fs => ManifestMeta.mayMatch(f, fs, types)))
        if (cands.isEmpty) Seq.empty
        else Seq(ManifestDeletes.line(ManifestDeletes.Tombstone(cands.toSet, f)))
    }
    val outLines = schema.toDDL +: ManifestSink.consolidateRefs(
      root, prior ++ replacedEpochs ++ ledger ++ tombstoneLine ++ segRef,
      s"$jobToken-m")
    branch match {
      case Some(b) =>
        ManifestSink.publishBranch(root, b, outLines,
          expectedHead = branchHeadNow.get)
      case None => ManifestSink.publish(root, outLines)
    }
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // (also reached when commit loses the CAS: Spark aborts after a
    // failed commit, deleting the staged files the loser left behind)
    val staging = Paths.get(path).resolve("_staging")
    messages.filter(_ != null).foreach { m =>
      m.asInstanceOf[StagedFileSet].files.foreach { e =>
        Files.deleteIfExists(staging.resolve(e.name))
      }
    }
  }
}

class ManifestWriterFactory(path: String, schema: StructType,
    jobToken: String = "job", format: String = "json",
    partitionBy: Seq[String] = Seq.empty, sortedCols: Seq[String] = Seq.empty,
    bloomFor: Seq[String] = Seq.empty, targetFileBytes: Long = 0L,
    rowGroupBytes: Long = 0L, zorderClaim: Seq[String] = Seq.empty)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(path, schema,
      f"part-$jobToken-$partitionId%05d-$taskId", format, partitionBy,
      sortedCols, bloomFor, targetFileBytes, rowGroupBytes, zorderClaim)
}

/** The STREAMING face of the two-phase-commit sink (VERDICT r12 Next
  * #2) — the epoch-id-idempotent `StreamingWrite` contract the
  * reference's BigQuery streaming inserts imply
  * (dataflow_pipeline/pipeline.py:180-200): exactly-once as a
  * first-class connector rather than a foreachBatch convention.
  *
  * Per micro-batch (epoch):
  *   - tasks stage under `e<epochId>-part-<partition>-<task>.json` —
  *     the epoch id is IN the name, so the manifest itself is the
  *     epoch ledger (no side state);
  *   - driver `commit(epochId, msgs)` APPENDS the epoch's files to the
  *     manifest via the same write-temp + ATOMIC_MOVE swap the batch
  *     face uses — readers see epoch boundaries, never mid-epoch;
  *   - a REPLAYED epoch (checkpoint recovery re-runs the last batch —
  *     Spark's contract says commit may be called again with the same
  *     epochId) is detected from the manifest prefix set and dropped:
  *     staged duplicates are deleted, the manifest is untouched —
  *     non-duplication pinned in ManifestStreamSinkSpec;
  *   - `abort` deletes the epoch's staged files, like the batch face.
  *
  * SINGLE-WRITER contract (same as the batch face): one streaming query
  * owns the table — Spark serializes epoch commits within a query, so
  * the read-modify-swap of the manifest never races itself.
  */
class ManifestStreamingWrite(path: String, schema: StructType,
    format: String = "json", sortedCols: Seq[String] = Seq.empty,
    bloomFor: Seq[String] = Seq.empty, targetFileBytes: Long = 0L,
    rowGroupBytes: Long = 0L)
    extends StreamingWrite {
  /** Per-RUN random component of segment names (ADVICE r16): epoch ids
    * alone are NOT run-unique — after an overwrite clears the epoch
    * ledger, a fresh-checkpoint query re-uses epoch 0, and a
    * deterministic `seg-e0.json` would collide with the old run's
    * segment that retained snapshots still reference. Epoch-replay
    * idempotence never needed deterministic names (the committedEpochs
    * guard runs before any segment write); a crash between segment
    * write and manifest swap just orphans one segment per attempt,
    * which vacuum reclaims.
    */
  private val runToken = util.UUID.randomUUID().toString.take(8)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new ManifestStreamingWriterFactory(path, schema, format, sortedCols,
      bloomFor, targetFileBytes, rowGroupBytes, runToken)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
      ManifestSink.withCommitLock(Paths.get(path)) {
    val root = Paths.get(path)
    val staging = root.resolve("_staging")
    val staged = messages.iterator
      .flatMap(_.asInstanceOf[StagedFileSet].files).toSeq.sortBy(_.name)
    if (ManifestSink.committedEpochs(path).contains(epochId)) {
      // epoch replay after recovery: already published — the staged
      // re-run output must vanish, not double-publish
      staged.foreach(e => Files.deleteIfExists(staging.resolve(e.name)))
      return
    }
    val data = root.resolve("data")
    Files.createDirectories(data)
    staged.foreach { e =>
      Files.move(staging.resolve(e.name), data.resolve(e.name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // the epoch's files + stats land in ONE new segment; every prior
    // list line (segment refs, inline names from pre-segment manifests,
    // `#e:`/`#s:` ledger lines) carries UNRESOLVED — a streaming epoch
    // append writes O(epoch) metadata bytes even on a million-file
    // table. The segment token carries the per-run random component
    // (see runToken above) so names are unique across runs; a crash
    // between segment write and manifest swap orphans at most one
    // segment per attempt, reclaimed by vacuum.
    val rawPrior = ManifestSink.rawListLines(root)
    val segRef =
      if (staged.isEmpty) Seq.empty
      else Seq(ManifestSink.writeSegment(root, s"e$epochId-$runToken",
        staged.map(_.name) ++ staged.map(_.statsLine)))
    ManifestSink.publish(root, schema.toDDL +:
      ManifestSink.consolidateRefs(root, rawPrior ++ segRef,
        s"e$epochId-$runToken-m"))
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val staging = Paths.get(path).resolve("_staging")
    messages.filter(_ != null).foreach { m =>
      m.asInstanceOf[StagedFileSet].files.foreach { e =>
        Files.deleteIfExists(staging.resolve(e.name))
      }
    }
  }
}

class ManifestStreamingWriterFactory(path: String, schema: StructType,
    format: String = "json", sortedCols: Seq[String] = Seq.empty,
    bloomFor: Seq[String] = Seq.empty, targetFileBytes: Long = 0L,
    rowGroupBytes: Long = 0L, runToken: String = "run") extends StreamingDataWriterFactory {
  // DATA file names carry the run token too (ADVICE r16, same hazard as
  // segments): a fresh-checkpoint run re-using epoch 0 after an
  // overwrite must never move over an old run's committed file that
  // retained snapshots still reference. The epoch id stays the name's
  // FIRST dash-delimited token — committedEpochs / `_epoch` provenance
  // parse `e<id>-` prefixes unchanged.
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new ManifestDataWriter(path, schema,
      f"e$epochId-$runToken-part-$partitionId%05d-$taskId", format, Seq.empty,
      sortedCols, bloomFor, targetFileBytes, rowGroupBytes)
}

/** One staged payload file being written — the closed row-serialization
  * contract both formats implement (long/int/double/string/null).
  */
private[sources] trait RowFileWriter {
  def write(row: InternalRow): Unit
  def close(): Unit
  /** Bytes buffered/written so far — drives size-bounded file rolling.
    * Approximate is fine (the roll is a bound, not an exact cut).
    */
  def approxBytes: Long
}

/** JSON-lines payload (the original inspectable format). */
private[sources] final class JsonRowFileWriter(file: Path, schema: StructType)
    extends RowFileWriter {
  private val out = Files.newBufferedWriter(file, StandardCharsets.UTF_8)
  private var written = 0L
  override def approxBytes: Long = written
  override def write(row: InternalRow): Unit = {
    val cells = schema.fields.zipWithIndex.map { case (f, i) =>
      val v =
        if (row.isNullAt(i)) "null"
        else f.dataType match {
          case LongType => row.getLong(i).toString
          case IntegerType => row.getInt(i).toString
          case DoubleType => row.getDouble(i).toString
          case StringType => ManifestMeta.quote(row.getUTF8String(i).toString)
          case other =>
            throw new IllegalArgumentException(s"unsupported sink type $other")
        }
      "\"" + f.name + "\":" + v
    }
    val line = cells.mkString("{", ",", "}")
    written += utf8Length(line) + 1L
    out.write(line)
    out.write("\n")
  }
  override def close(): Unit = out.close()

  /** ENCODED (UTF-8) byte length, counted from chars without allocating
    * (ADVICE r16): `line.length` counts UTF-16 chars, which under-counts
    * multibyte text ~3× for CJK — the `targetFileBytes` roll then fires
    * far past the bound. Surrogate halves count 2 each (a valid pair =
    * 4 bytes); an unpaired surrogate actually encodes as 1 byte ('?'),
    * so this over-counts that pathological case — the roll is a bound.
    */
  private def utf8Length(s: String): Long = {
    var n = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      n += (if (c < 0x80) 1 else if (c < 0x800) 2
            else if (Character.isSurrogate(c)) 2 else 3)
      i += 1
    }
    n
  }
}

/** PARQUET payload (VERDICT r14 Next #1 — the 100 TB format): columnar,
  * snappy-compressed, written through parquet-mr's public example API
  * so the commit protocol stays byte-identical to the JSON path (stage
  * → move → manifest swap) while the payload gains column-chunk
  * skipping. Spark's own vectorized reader consumes these files on the
  * rewrite paths ([[ManifestSink.readDataFiles]]); the connector read
  * path projects only the pruned columns (see ManifestParquetReader).
  */
private[sources] final class ParquetRowFileWriter(file: Path, schema: StructType,
    rowGroupBytes: Long = 0L)
    extends RowFileWriter {
  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.hadoop.example.ExampleParquetWriter
  import org.apache.parquet.hadoop.metadata.CompressionCodecName
  import org.apache.parquet.io.api.Binary

  private val mt = ManifestParquet.messageType(schema)
  private val factory = new SimpleGroupFactory(mt)
  private val writer = ExampleParquetWriter
    .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toString),
      new org.apache.hadoop.conf.Configuration()))
    .withType(mt)
    .withCompressionCodec(CompressionCodecName.SNAPPY)
    // write option `rowGroupBytes` (r17): smaller row groups give the
    // read side's footer-stats filter finer skipping granularity inside
    // big files — the intra-file complement of the file-level zone maps
    .withRowGroupSize(if (rowGroupBytes > 0L) rowGroupBytes
                      else org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE.toLong)
    .build()

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    val fields = schema.fields
    while (i < fields.length) {
      if (!row.isNullAt(i)) fields(i).dataType match {
        case LongType => g.add(i, row.getLong(i))
        case IntegerType => g.add(i, row.getInt(i))
        case DoubleType => g.add(i, row.getDouble(i))
        case StringType =>
          g.add(i, Binary.fromString(row.getUTF8String(i).toString))
        case other =>
          throw new IllegalArgumentException(s"unsupported sink type $other")
      }
      i += 1
    }
    writer.write(g)
  }
  // parquet-mr's running buffered-data estimate (public ParquetWriter API)
  override def approxBytes: Long = writer.getDataSize
  override def close(): Unit = writer.close()
}

/** Task-side writer: rows stream into uniquely-named staging files
  * (batch: (partition, task)-keyed; streaming: epoch-prefixed) — task
  * retries/speculation stage under different names and only the
  * committed attempt's message reaches the driver, so duplicates never
  * publish. With `partitionBy` set the writer ROLLS to a new file at
  * every partition-value boundary (rows arrive sorted by the partition
  * columns — the Write's requiredOrdering guarantees it), so every
  * committed file is partition-PURE: the property the read side's
  * KeyGroupedPartitioning report stands on. Per-file column stats
  * accumulate as rows pass and ship in the commit message.
  */
class ManifestDataWriter(path: String, schema: StructType,
    baseName: String, format: String = "json",
    partitionBy: Seq[String] = Seq.empty, sortedCols: Seq[String] = Seq.empty,
    bloomFor: Seq[String] = Seq.empty, targetFileBytes: Long = 0L,
    rowGroupBytes: Long = 0L, zorderClaim: Seq[String] = Seq.empty)
    extends DataWriter[InternalRow] {

  private val staging = Paths.get(path).resolve("_staging")
  Files.createDirectories(staging)
  private val ext = if (format == "parquet") "parquet" else "json"
  /** Partition SPECS (r19): entries are identity columns or transform
    * renderings (`days(ts)`, `bucket(n,id)`, `truncate(w,s)`); keys are
    * the TRANSFORM values, so rolled files are transform-pure by
    * construction.
    */
  private val partSpecs: Array[PartitionTransforms.Spec] =
    partitionBy.map(PartitionTransforms.parse).toArray
  private val partIdx: Array[Int] = partSpecs.map { t =>
    val i = schema.fieldIndex(t.source)
    val dt = schema.fields(i).dataType
    require(t.accepts(dt),
      s"unsupported partition column type $dt for ${t.render}")
    i
  }
  /** A non-monotonic spec (bucket) switches the task writer to a
    * KEYED-WRITER MAP: the write's required ordering sorts by SOURCE
    * columns, under which bucket values alternate at nearly every
    * distinct value — roll-on-change would explode the file count, so
    * each partition tuple instead keeps one open writer (bounded: the
    * bucket modulus bounds distinct tuples per task).
    */
  private val multiOpen: Boolean = partSpecs.exists(!_.monotonic)

  private val staged = Seq.newBuilder[StagedEntry]
  private var fileSeq = 0
  private var currentName: String = _
  private var out: RowFileWriter = _
  private var stats: ManifestMeta.StatsCollector = _
  private var currentKey: Array[Any] = _
  // keyed-writer state (multiOpen only): partition tuple -> open sink;
  // the cap is enforced at DDL (PartitionTransforms.validate), this is
  // the defense-in-depth task-side backstop
  private val keyed = new java.util.LinkedHashMap[Seq[Any],
    (RowFileWriter, ManifestMeta.StatsCollector, String)]()
  private val MaxOpenWriters = PartitionTransforms.MaxBuckets

  private def keyOf(row: InternalRow): Array[Any] =
    partIdx.zip(partSpecs).map { case (i, t) =>
      if (row.isNullAt(i)) null
      else {
        val cell: Any = schema.fields(i).dataType match {
          case LongType => row.getLong(i)
          case IntegerType => row.getInt(i)
          case DoubleType =>
            // -0.0 and 0.0 are one grouping key in Spark's semantics but
            // distinct boxed Doubles: normalize, or a table holding both
            // would roll two "pure" files whose keys a grouped metadata
            // fold would treat as two groups (ADVICE r15)
            val d = row.getDouble(i)
            if (d == 0.0d) 0.0d else d
          case StringType => row.getUTF8String(i).toString
        }
        t.eval(cell)
      }
    }

  private def newFileWriter(name: String): RowFileWriter = {
    val p = staging.resolve(name)
    if (format == "parquet") new ParquetRowFileWriter(p, schema, rowGroupBytes)
    else new JsonRowFileWriter(p, schema)
  }

  private def nextName(): String = {
    val n = if (partIdx.isEmpty && fileSeq == 0) s"$baseName.$ext"
            else f"$baseName-r$fileSeq%04d.$ext"
    fileSeq += 1
    n
  }

  private def open(): Unit = {
    currentName = nextName()
    out = newFileWriter(currentName)
    stats = new ManifestMeta.StatsCollector(schema, bloomFor.toSet)
  }

  /** Close + stage one file with its stats line: one stat syscall here
    * (at write time, against the just-closed file) saves O(files) stat
    * syscalls at every subsequent plan (VERDICT r15).
    *
    * `key` is the file's partition tuple (transform values, spec
    * order). HASH transforms (bucket) record their value as a `pv`
    * stats claim — the read side's KeyGroupedPartitioning needs the
    * bucket number and no order statistic can reconstruct it;
    * monotonic transforms record nothing (purity re-VERIFIES from
    * [min,max] at plan time).
    */
  private def sealEntry(w: RowFileWriter,
      st: ManifestMeta.StatsCollector, name: String,
      key: Seq[Any] = null): Unit = {
    w.close()
    val bytes = Files.size(staging.resolve(name))
    val pvClaim: Map[String, Any] =
      if (key == null) Map.empty
      else partSpecs.toSeq.zip(key).collect {
        case (t, v) if !t.monotonic && v != null => t.render -> v
      }.toMap
    staged += StagedEntry(name,
      ManifestMeta.statsLine(name,
        st.result(sortedCols).copy(bytes = bytes, zorder = zorderClaim,
          pv = pvClaim)))
  }

  private def seal(): Unit = if (out != null) {
    sealEntry(out, stats, currentName)
    out = null
  }

  /** Keyed-writer path (non-monotonic specs, r19): one open file per
    * partition tuple regardless of arrival order. Rows of one keyed
    * file are a subsequence of the task's (source-sorted) stream, so
    * the recorded `sorted` claim stays true per file.
    */
  private def writeKeyed(row: InternalRow): Unit = {
    val k = keyOf(row).toSeq
    var e = keyed.get(k)
    if (e == null) {
      if (keyed.size() >= MaxOpenWriters) {
        // bounded memory under composite specs (e.g. days x bucket,
        // where the source-sorted stream retires old days silently):
        // seal the ELDEST open writer — an extra file per eviction,
        // never a failure, and every sealed file stays transform-pure
        val it = keyed.entrySet().iterator()
        val eldest = it.next()
        sealEntry(eldest.getValue._1, eldest.getValue._2, eldest.getValue._3,
          eldest.getKey)
        it.remove()
      }
      val name = nextName()
      e = (newFileWriter(name),
        new ManifestMeta.StatsCollector(schema, bloomFor.toSet), name)
      keyed.put(k, e)
    }
    e._2.observe(row)
    e._1.write(row)
    if (targetFileBytes > 0L && e._1.approxBytes >= targetFileBytes) {
      sealEntry(e._1, e._2, e._3, k)
      keyed.remove(k)
      ()
    }
  }

  override def write(row: InternalRow): Unit = {
    if (multiOpen) { writeKeyed(row); return }
    if (partIdx.nonEmpty) {
      val k = keyOf(row)
      if (out == null || !java.util.Arrays.equals(
          currentKey.asInstanceOf[Array[AnyRef]], k.asInstanceOf[Array[AnyRef]])) {
        seal()
        open()
        currentKey = k
      }
    } else if (out == null) open()
    stats.observe(row)
    out.write(row)
    // SIZE-BOUNDED ROLL (write option targetFileBytes): a huge
    // partition value — or an unpartitioned task — can't grow one
    // unbounded file; the roll keeps the current partition key, so
    // every rolled file stays partition-pure and internally sorted
    // (Spark groups same-key partitions on read; the ordering claim
    // drops under duplicate keys exactly as for multi-file appends).
    // SEAL ONLY — the next write() lazily opens, so a roll firing on a
    // task's LAST row can never stage a zero-row file (whose undefined
    // min/max would demote the whole table's purity claims —
    // code-review r16 #2)
    if (targetFileBytes > 0L && out.approxBytes >= targetFileBytes)
      seal()
  }

  override def commit(): WriterCommitMessage = {
    seal()
    keyed.forEach((k, e) => sealEntry(e._1, e._2, e._3, k))
    keyed.clear()
    StagedFileSet(staged.result())
  }

  override def abort(): Unit = {
    if (out != null) { out.close(); out = null }
    keyed.forEach((_, e) => {
      e._1.close()
      Files.deleteIfExists(staging.resolve(e._3))
      ()
    })
    keyed.clear()
    staged.result().foreach(e => Files.deleteIfExists(staging.resolve(e.name)))
    if (currentName != null) Files.deleteIfExists(staging.resolve(currentName))
    ()
  }
  override def close(): Unit = ()
}

/** StructType ↔ parquet MessageType for the closed column-type set. */
private[sources] object ManifestParquet {
  import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

  def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType => b.addField(
          Types.optional(PrimitiveTypeName.INT64).named(f.name))
        case IntegerType => b.addField(
          Types.optional(PrimitiveTypeName.INT32).named(f.name))
        case DoubleType => b.addField(
          Types.optional(PrimitiveTypeName.DOUBLE).named(f.name))
        case StringType => b.addField(
          Types.optional(PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.stringType()).named(f.name))
        case other =>
          throw new IllegalArgumentException(s"unsupported sink type $other")
      }
    }
    b.named("graft")
  }
}
