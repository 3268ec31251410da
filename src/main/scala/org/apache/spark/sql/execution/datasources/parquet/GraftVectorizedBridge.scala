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
      fileReader: ParquetFileReader, totalRowCount: Long): Unit =
    reader.initialize(fileSchema, requestedSchema,
      new SpecificParquetRecordReaderBase.ParquetRowGroupReader {
        override def readNextRowGroup(): PageReadStore =
          fileReader.readNextRowGroup()
        override def close(): Unit = fileReader.close()
      },
      math.min(totalRowCount, Int.MaxValue.toLong).toInt)
}
