package org.apache.spark.sql.execution.datasources.parquet

import org.apache.parquet.column.page.PageReadStore
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.schema.MessageType

/** Package-placed bridge into [[SpecificParquetRecordReaderBase]]'s
  * package-private `ParquetRowGroupReader` injection point — the same
  * shim pattern every external Spark connector uses to reach
  * non-public extension seams. This lets the graft lake reader hand
  * the vectorized decoder a [[ParquetFileReader]] it opened WITH a
  * row-group record filter (footer min/max skipping), which the public
  * `initialize(path, columns)` convenience cannot express.
  */
object GraftVectorizedBridge {

  /** Initialize `reader` over the (already row-group-filtered) file
    * reader: only surviving row groups ever decode.
    */
  def initWithRowGroups(reader: VectorizedParquetRecordReader,
      fileSchema: MessageType, requestedSchema: MessageType,
      fileReader: ParquetFileReader, totalRowCount: Long): Unit = {
    // the injection seam takes an Int row count — refuse LOUDLY past it
    // (a silent clamp would truncate reads of a >2^31-row file, while
    // the unfiltered path reads it whole — code-review r17)
    require(totalRowCount <= Int.MaxValue.toLong,
      s"filtered vectorized read cannot address $totalRowCount rows in " +
        "one file (Int row-count seam) — split the file (targetFileBytes)")
    reader.initialize(fileSchema, requestedSchema,
      new SpecificParquetRecordReaderBase.ParquetRowGroupReader {
        override def readNextRowGroup(): PageReadStore =
          fileReader.readNextRowGroup()
        override def close(): Unit = fileReader.close()
      },
      totalRowCount.toInt)
  }
}
