package graft.sources

import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, Write, WriteBuilder}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL-native row-level DML (VERDICT r16 Next #2): `UPDATE` and
  * `MERGE INTO` (and group-routed `DELETE`) plan through Spark's
  * `SupportsRowLevelOperations` API backed by the COPY-ON-WRITE
  * materialization the engine already has — the same
  * candidate-prune → rewrite → replace-commit shape as
  * [[ManifestSink.merge]] and [[ManifestTable.deleteWhere]]:
  *
  *   - the operation's SCAN is the ordinary manifest scan in
  *     GROUP-CANDIDATE mode: pushed filters prune whole FILES
  *     (envelope tier first, then per-file stats), but rows are NEVER
  *     filtered inside kept files — Spark's ReplaceData plan rewrites
  *     every row of every scanned file, so a row dropped by the scan
  *     would be silently deleted (dataFilters stay empty; residual
  *     re-evaluation isn't above this plan to correct over-pruning);
  *   - Spark's runtime GROUP FILTERING narrows the scan to files that
  *     actually hold matches (the scan's `_file` runtime-filter face),
  *     so a selective MERGE rewrites the matched files, not the table;
  *   - the WRITE is the ordinary two-phase manifest write in append
  *     mode with `replaceFiles` = the scan's FINAL file set, resolved
  *     lazily at commit (after runtime filtering) — one atomic
  *     snapshot swap, CAS-protected against concurrent commits, and
  *     layout/bloom/format-preserving like every other rewrite.
  *
  * MERGE-ON-READ tables (`deleteMode 'mor'`) route their DELETE
  * through the metadata-only tombstone path as before (Spark's
  * OptimizeMetadataOnlyDeleteFromTable picks it when canDeleteWhere
  * accepts); UPDATE/MERGE currently use this copy-on-write operation —
  * correct on any table, with rewrite (not tombstone) write cost.
  */
class ManifestCowOperation(path: String, tableSchema: StructType,
    cmd: Command,
    clusterBy: Seq[String], orderBy: Seq[String], partitionBy: Seq[String],
    format: String, bloomFor: Seq[String], targetFileBytes: Long,
    rowGroupBytes: Long, splitConf: SplitConf)
    extends RowLevelOperation {

  /** The operation's scan, recorded at build so the write can replace
    * exactly the files Spark read (post runtime group filtering).
    */
  @volatile private var builtScan: ManifestScan = _

  /** CAS base: the generation the candidate scan plans against —
    * captured when the scan builder is created, i.e. before the scan's
    * manifest read, so an interleaved commit can only make the check
    * spuriously strict, never unsafe.
    */
  @volatile private var baseGen: Long = -1L

  override def command(): Command = cmd

  override def description(): String = s"ManifestCow($cmd, $path)"

  /** `_file` rides the scan so Spark's runtime group filter can name
    * the matched files.
    */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column("_file"))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    baseGen = ManifestSink.snapshots(path).lastOption.getOrElse(0L)
    new ManifestScanBuilder(path, tableSchema, partitionBy,
      snapshotGen = None, splitConf, rowLevelMode = true) {
      override private[sources] def onBuilt(s: ManifestScan): Unit =
        builtScan = s
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = {
        // layout-preserving rewrite, same derivation as deleteWhere:
        // declared table options win, else the committed stats' claims
        val rootP = java.nio.file.Paths.get(path)
        val names = ManifestSink.rawManifest(rootP).map(_._2).getOrElse(Seq.empty)
        val stats = ManifestSink.fileStats(path)
        val fmt = if (format != "json") format
                  else ManifestSink.derivedFormat(names)
        val (dp, dob) = ManifestSink.derivedLayout(names, stats, tableSchema)
        val pBy = if (partitionBy.nonEmpty) partitionBy else dp
        val oBy = if (orderBy.nonEmpty) orderBy else dob
        val blm = if (bloomFor.nonEmpty) bloomFor
                  else ManifestSink.derivedBloomCols(names, stats)
        // the write schema must be the TABLE's schema: the publish path
        // records info.schema() as the table DDL, and a metadata column
        // leaking in would silently widen the table on commit
        val writeSchema = info.schema()
        require(writeSchema.fieldNames.forall(tableSchema.fieldNames.contains),
          s"row-level write schema ${writeSchema.fieldNames.mkString(",")} " +
            s"must be a subset of the table schema")
        new ManifestWrite(path, writeSchema,
          clusterBy = clusterBy, orderBy = oBy, replace = false,
          partitionBy = pBy, format = fmt,
          baseGen = baseGen,
          bloomFor = blm, targetFileBytes = targetFileBytes,
          rowGroupBytes = rowGroupBytes,
          // the replaced set resolves at COMMIT: runtime group
          // filtering has narrowed the scan by then, and replacing
          // exactly the scanned files is the correctness contract of
          // the group-based plan
          replaceFilesF = () => Option(builtScan)
            .map(_.currentFileNames).getOrElse(Seq.empty))
      }
    }
}

/** A builder is one operation instance — Spark resolves the scan and
  * write through the SAME object, which is what lets the write replace
  * exactly the scanned files.
  */
class ManifestRowLevelBuilder(path: String, tableSchema: StructType,
    cmd: Command,
    clusterBy: Seq[String], orderBy: Seq[String], partitionBy: Seq[String],
    format: String, bloomFor: Seq[String], targetFileBytes: Long,
    rowGroupBytes: Long, splitConf: SplitConf)
    extends org.apache.spark.sql.connector.write.RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new ManifestCowOperation(path, tableSchema, cmd, clusterBy, orderBy,
      partitionBy, format, bloomFor, targetFileBytes, rowGroupBytes, splitConf)
}
