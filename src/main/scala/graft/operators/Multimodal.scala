package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Extracted metadata for one media blob. */
case class MediaMeta(
    doc_id: Long,
    n_bytes: Long,
    fake_width: Int,
    fake_height: Int,
    content_hash: String)

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata alongside. The decode / feature-extract step
  * runs as a batched `mapPartitions` over the typed Dataset — the Scala
  * analogue of a Pandas-UDF `mapInPandas` stage: one decoder init per
  * partition, streaming iterator, no driver collection.
  *
  * The actual image/audio decode is STUBBED (no media libraries in this
  * container): `decodeStub` derives deterministic fake dimensions from the
  * byte payload. The Spark-side plumbing — binary column, partition-wise
  * batch shape, typed output schema — is real and oracle-checked.
  */
object Multimodal {

  private def md5hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(bytes).map("%02x".format(_)).mkString
  }

  /** STUB decoder: stands in for an image decode. Deterministic on input
    * bytes so results are reproducible and oracle-checkable.
    */
  private def decodeStub(id: Long, blob: Array[Byte]): MediaMeta =
    MediaMeta(
      doc_id = id,
      n_bytes = blob.length.toLong,
      fake_width = (blob.length % 640 + 1),
      fake_height = (blob.length % 480 + 1),
      content_hash = md5hex(blob))

  /** Binary-column pipeline: text → utf-8 blob column → per-partition
    * batched "decode" → typed metadata rows.
    */
  def mediaMetadata(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (one per task, not per row)
        rows.map { case (id, blob) => decodeStub(id, blob) }
      }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> ((s, dir) =>
      mediaMetadata(s, Tables.documents(s, dir)).toDF())
  )

  def oracleSql: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS fake_width,
        | CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS fake_height,
        | md5(text) AS content_hash
        |FROM documents""".stripMargin
  )
}
