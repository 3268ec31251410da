package graft.ingest

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** One decoded-after-round-trip wire record plus its binary size. */
case class AvroTxn(
    transaction_id: String,
    customer_id: Long,
    amount: Double,
    transaction_channel: String,
    card_number: String, // null for the UPI-style rows (Avro union null)
    n_avro_bytes: Long)

/** BINARY Avro round-trip of the reference's wire record shape
  * (fact_table_ingestion/schemas/fact_transactions_pub-sub.avsc — the
  * reference publishes the JSON encoding of this schema, which
  * TxnPipeline ingests; real Pub/Sub/Kafka deployments carry the binary
  * encoding, exercised here with the plain Avro core library — no
  * spark-avro connector exists in this container).
  *
  * Per-partition writer/reader/record instances (the DoFn.setup shape:
  * Avro datum writers are not thread-safe and re-parsing the schema per
  * row would dominate); the encoder/decoder buffers are also reused
  * through the factory's reuse parameters.
  *
  * The oracle cannot produce Avro bytes — instead it PREDICTS the
  * binary size per record from the Avro spec's own rules (zigzag varint
  * longs, length-prefixed strings, 8-byte doubles, 1-byte union index),
  * so a round-trip that silently fell back to a different encoding, or
  * dropped the union branch, breaks the hash even though the decoded
  * FIELDS would still match.
  */
object AvroWire {

  val SchemaJson: String =
    """{"type":"record","name":"Txn","fields":[
      | {"name":"transaction_id","type":"string"},
      | {"name":"customer_id","type":"long"},
      | {"name":"amount","type":"double"},
      | {"name":"transaction_channel","type":"string"},
      | {"name":"card_number","type":["null","string"],"default":null}]}""".stripMargin

  def roundTrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // channel from the SHARED wire ladder (IngestQueries.channelFromR)
    val src = Tables.orders(s, dir).select(
        col("o_orderkey").cast("string").as("tid"),
        col("o_custkey").as("cid"),
        col("o_totalprice").as("amount"),
        IngestQueries.channelFromR(
          IngestQueries.rHash(col("o_orderkey"))).as("channel"),
        when(col("o_orderkey") % 10 <= 6,
          lpad(col("o_orderkey").cast("string"), 16, "4")).as("pan"))
      .as[(String, Long, Double, String, Option[String])]
    src.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(SchemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val reader = new GenericDatumReader[GenericRecord](schema)
      val baos = new java.io.ByteArrayOutputStream()
      var encoder: org.apache.avro.io.BinaryEncoder = null
      var decoder: org.apache.avro.io.BinaryDecoder = null
      rows.map { case (tid, cid, amount, channel, pan) =>
        val rec = new GenericData.Record(schema)
        rec.put("transaction_id", tid)
        rec.put("customer_id", cid)
        rec.put("amount", amount)
        rec.put("transaction_channel", channel)
        rec.put("card_number", pan.orNull)
        baos.reset()
        encoder = EncoderFactory.get().binaryEncoder(baos, encoder)
        writer.write(rec, encoder)
        encoder.flush()
        val bytes = baos.toByteArray
        decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
        val back = reader.read(null, decoder)
        AvroTxn(
          back.get("transaction_id").toString,
          back.get("customer_id").asInstanceOf[Long],
          back.get("amount").asInstanceOf[Double],
          back.get("transaction_channel").toString,
          Option(back.get("card_number")).map(_.toString).orNull,
          bytes.length.toLong)
      }
    }.toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_avro_roundtrip" -> ((s, dir) => roundTrip(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    // Binary size from the Avro spec itself: strings are varint(len) +
    // len bytes; longs are zigzag varints (cid >= 0 -> z = 2*cid);
    // doubles are 8 bytes; the union spends one varint on the branch
    // index. vint(n) below is the varint byte count for n < 2^28.
    "q_avro_roundtrip" ->
      s"""WITH w AS (SELECT
        |  CAST(o_orderkey AS VARCHAR) AS transaction_id,
        |  o_custkey AS customer_id,
        |  o_totalprice AS amount,
        |  ${IngestQueries.channelFromRSql("r")} AS transaction_channel,
        |  CASE WHEN o_orderkey % 10 <= 6
        |       THEN lpad(CAST(o_orderkey AS VARCHAR), 16, '4') END AS card_number
        | FROM (SELECT *, ${IngestQueries.rHashSql("o_orderkey")} AS r
        |       FROM orders) t),
        | sized AS (SELECT *,
        |  CASE WHEN length(transaction_id) < 64 THEN 1 ELSE 2 END
        |    + length(transaction_id) AS sz_tid,
        |  CASE WHEN 2 * customer_id < 128 THEN 1
        |       WHEN 2 * customer_id < 16384 THEN 2
        |       WHEN 2 * customer_id < 2097152 THEN 3
        |       ELSE 4 END AS sz_cid,
        |  CASE WHEN length(transaction_channel) < 64 THEN 1 ELSE 2 END
        |    + length(transaction_channel) AS sz_ch,
        |  CASE WHEN card_number IS NULL THEN 1 ELSE 1 + 1 + 16 END AS sz_pan
        | FROM w)
        |SELECT transaction_id, customer_id, amount, transaction_channel,
        | card_number,
        | CAST(sz_tid + sz_cid + 8 + sz_ch + sz_pan AS BIGINT) AS n_avro_bytes
        |FROM sized""".stripMargin
  )
}
