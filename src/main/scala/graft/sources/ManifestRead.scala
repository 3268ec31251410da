package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The READ face of the manifest table — what turns the sink into a
  * full DSv2 TABLE (readable through the GraftCatalog with plain SQL,
  * not just via the [[ManifestSink.readCommitted]] helper):
  *
  *   - partition planning is ONE manifest snapshot read at build time —
  *     one file per InputPartition, so a 1000-file table fans out to
  *     1000 independent readers and a concurrent overwrite/compaction
  *     can never tear the file list mid-scan (the same isolation the
  *     helper gives, now at connector level);
  *   - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): the reader
  *     parses every line but materializes only the pruned fields;
  *   - exact [[SupportsReportStatistics]] from the committed file sizes,
  *     so a small manifest table plans as a broadcast side.
  *
  * The value parser decodes exactly the JSON-lines subset
  * [[ManifestDataWriter]] emits (long/int/double/string/null, the same
  * escape set) — a closed round trip, spec-pinned through JSON-hostile
  * strings.
  */
class ManifestScanBuilder(path: String, tableSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    // ONE manifest snapshot: the scan carries its file list from here on
    val files = ManifestSink.committedFiles(path)
    new ManifestScan(path, files, tableSchema, required)
  }
}

class ManifestScan(path: String, files: Seq[String], tableSchema: StructType,
    required: StructType)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ManifestScan(files=${files.size}, cols=${required.fieldNames.mkString(",")})"

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ManifestSnapshotStream(path, tableSchema, required)

  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => ManifestFilePartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(tableSchema, required)

  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = files.map { f =>
      val p = Paths.get(f)
      if (Files.exists(p)) Files.size(p) else 0L
    }.sum
    override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(bytes)
    override def numRows(): util.OptionalLong = util.OptionalLong.empty()
  }
}

case class ManifestFilePartition(file: String) extends InputPartition

/** STREAMING FROM THE LAKE TABLE — the Delta/Iceberg streaming-source
  * shape: every committed generation is a replayable CHANGE SET, and a
  * streaming query consumes the table one snapshot per micro-batch.
  * Offsets are snapshot generation numbers (checkpoint-durable longs);
  * batch (start, end] reads exactly the files end's manifest added over
  * start's — append-only deltas, each committed row delivered exactly
  * once across the feed. Admission control advances ONE generation per
  * batch, so commit boundaries are batch boundaries (the property a CDC
  * consumer keys on).
  *
  * RETENTION CONTRACT: the feed resolves historical generations via the
  * `_snapshots/` manifests, so `vacuum(root, retainSnapshots = N)` must
  * retain at least the generations an active consumer has not yet read
  * — the same snapshot-expiry discipline every lake streaming source
  * imposes (a pruned snapshot fails the read LOUDLY, never silently).
  */
class ManifestSnapshotStream(path: String, tableSchema: StructType,
    required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset

  // AvailableNow: drain up to the generation observed at trigger time,
  // one generation per batch — later commits wait for the next trigger
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(gens.lastOption.getOrElse(0L))
  override def reportLatestOffset(): Offset =
    SnapshotOffset(gens.lastOption.getOrElse(0L))

  private def gens: Seq[Long] = ManifestSink.snapshots(path)

  /** Bare file NAMES of snapshot `gen` (empty for gen 0 = before the
    * first commit).
    */
  private def namesAt(gen: Long): Set[String] =
    if (gen == 0L) Set.empty
    else {
      val m = Paths.get(path).resolve("_snapshots").resolve(s"manifest-$gen.json")
      if (!Files.exists(m)) throw new IllegalStateException(
        s"snapshot $gen of $path expired while a streaming consumer still " +
          s"needed it — retain more generations in vacuum()")
      Files.readAllLines(m).toArray(Array.empty[String]).toSeq
        .drop(1).filterNot(_.startsWith("#")).toSet
    }

  override def initialOffset(): Offset = SnapshotOffset(0L)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is the entry point")
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val s = start.asInstanceOf[SnapshotOffset].gen
    // one generation per micro-batch: commit boundaries = batch boundaries
    val next = gens.find(_ > s).getOrElse(s)
    SnapshotOffset(availableNowTarget.fold(next)(t => math.min(next, t)))
  }
  override def deserializeOffset(json: String): Offset =
    SnapshotOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotOffset].gen
    val e = end.asInstanceOf[SnapshotOffset].gen
    if (e <= s) return Array.empty
    val added = (namesAt(e) -- namesAt(s)).toSeq.sorted
    added.map(n => ManifestFilePartition(
      Paths.get(path).resolve("data").resolve(n).toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(tableSchema, required)
}

case class SnapshotOffset(gen: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = gen.toString
}

class ManifestReaderFactory(tableSchema: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ManifestJsonReader(p.asInstanceOf[ManifestFilePartition].file,
      tableSchema, required)
}

/** Streams one committed JSON-lines file as InternalRows of the pruned
  * schema. The parser is the exact inverse of the writer's serializer:
  * `{"name":value,...}` per line, values ∈ {null, integer/decimal
  * literal, escaped string}.
  */
class ManifestJsonReader(file: String, tableSchema: StructType,
    required: StructType) extends PartitionReader[InternalRow] {

  private val lines = Files.newBufferedReader(
    Paths.get(file), StandardCharsets.UTF_8)
  private val types: Map[String, DataType] =
    tableSchema.fields.map(f => f.name -> f.dataType).toMap
  // lineage metadata, served per-partition for free: the file name and
  // the streaming epoch its name carries (-1 for batch-written files)
  private val fileName = Paths.get(file).getFileName.toString
  private val fileNameUtf8 = UTF8String.fromString(fileName)
  private val epochOfFile: Long =
    if (fileName.startsWith("e"))
      fileName.drop(1).takeWhile(_ != '-').toLongOption.getOrElse(-1L)
    else -1L
  private var current: InternalRow = _

  override def next(): Boolean = {
    val line = lines.readLine()
    if (line == null) return false
    current = parse(line)
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = lines.close()

  private def parse(line: String): InternalRow = {
    val cells = new java.util.HashMap[String, Any]()
    var i = 1 // past '{'
    while (i < line.length && line.charAt(i) != '}') {
      if (line.charAt(i) == ',') i += 1
      // key: always a simple quoted field name (writer-controlled)
      val keyEnd = line.indexOf('"', i + 1)
      val key = line.substring(i + 1, keyEnd)
      i = keyEnd + 2 // past closing quote and ':'
      line.charAt(i) match {
        case '"' =>
          val sb = new java.lang.StringBuilder
          i += 1
          while (line.charAt(i) != '"') {
            line.charAt(i) match {
              case '\\' =>
                line.charAt(i + 1) match {
                  case '"' => sb.append('"'); i += 2
                  case '\\' => sb.append('\\'); i += 2
                  case 'n' => sb.append('\n'); i += 2
                  case 'r' => sb.append('\r'); i += 2
                  case 't' => sb.append('\t'); i += 2
                  case 'u' =>
                    sb.append(Integer.parseInt(
                      line.substring(i + 2, i + 6), 16).toChar)
                    i += 6
                  case other => throw new IllegalArgumentException(
                    s"unknown escape \\$other in $file")
                }
              case c => sb.append(c); i += 1
            }
          }
          i += 1
          cells.put(key, UTF8String.fromString(sb.toString))
        case 'n' => // null
          i += 4
          cells.put(key, null)
        case _ =>
          var j = i
          while (j < line.length && line.charAt(j) != ',' && line.charAt(j) != '}') j += 1
          val tok = line.substring(i, j)
          i = j
          // by-name resolution must tolerate BOTH directions of schema
          // drift: a schema column absent from the file reads null (the
          // required-loop below), and a FILE key absent from the schema
          // is skipped (ADVICE r14 — reachable when re-attaching a table
          // over an existing path with fewer/renamed columns declared)
          types.get(key) match {
            case Some(LongType) => cells.put(key, java.lang.Long.parseLong(tok))
            case Some(IntegerType) => cells.put(key, java.lang.Integer.parseInt(tok))
            case Some(DoubleType) => cells.put(key, java.lang.Double.parseDouble(tok))
            case Some(StringType) => // unquoted never written; defensive
              cells.put(key, UTF8String.fromString(tok))
            case Some(other) => throw new IllegalArgumentException(
              s"unsupported manifest read type $other")
            case None => () // key not in the table schema: skip
          }
      }
    }
    InternalRow.fromSeq(required.fields.toIndexedSeq.map {
      case f if f.name == "_file" => fileNameUtf8
      case f if f.name == "_epoch" => epochOfFile
      case f => cells.get(f.name)
    })
  }
}
