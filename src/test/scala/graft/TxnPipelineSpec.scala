package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.TxnPipeline

/** Unit coverage of the ingest parse chain's shape tolerance (U1):
  * the hot path is one from_json struct parse, and rows whose union
  * fields arrive as BARE SCALARS (the reference's unwrap_primitives
  * passes plain values through, pipeline.py:57-69) must still extract
  * through the lazy variant fallback instead of dead-lettering —
  * that arm only runs on rows the struct parse rejected, so this spec
  * is the regression gate for the corrupt-row second chance.
  */
class TxnPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val key = "0123456789abcdef0123456789abcdef".getBytes("UTF-8")

  private def run(lines: String*): (Seq[org.apache.spark.sql.Row], Seq[org.apache.spark.sql.Row]) = {
    import spark.implicits._
    val (v, e) = TxnPipeline.process(spark, lines.toDF("raw"), key)
    (v.collect().toSeq, e.collect().toSeq)
  }

  private def base(extra: String): String =
    s"""{"transaction_id":"t1","customer_id":7,"amount":100.0,""" +
      s""""tax_amount":18.0,"discount_amount":0.0,"total_amount":118.0,""" +
      s""""transaction_channel":"UPI","is_recurring":true,""" +
      s""""transaction_datetime":"2024-03-15T10:42:31.123456",$extra""" +
      s""""risk_score":0.25}"""

  test("wrapped union fields extract on the struct hot path") {
    val (valid, errors) = run(
      base(""""card_number":{"string":"4556737586899855"},"payment_gateway_id":{"int":3},"""))
    assert(errors.isEmpty)
    assert(valid.head.getAs[String]("masked_card_number") == "455673******9855")
    assert(valid.head.getAs[Long]("payment_gateway_id") == 3L)
  }

  test("bare-scalar union fields survive via the lazy variant fallback") {
    val (valid, errors) = run(
      base(""""card_number":"4556737586899855","payment_gateway_id":3,"""))
    assert(errors.isEmpty, s"bare-scalar row dead-lettered: $errors")
    val r = valid.head
    assert(r.getAs[String]("transaction_id") == "t1")
    assert(r.getAs[Long]("customer_id") == 7L)
    assert(r.getAs[String]("masked_card_number") == "455673******9855")
    assert(r.getAs[Long]("payment_gateway_id") == 3L)
    assert(r.getAs[Double]("risk_score") == 0.25)
  }

  test("genuinely malformed JSON still dead-letters as Malformed JSON") {
    val (valid, errors) = run("{nope")
    assert(valid.isEmpty)
    assert(errors.head.getAs[String]("error") == "Malformed JSON")
  }

  test("well-formed row missing its id dead-letters with the distinct label") {
    val (valid, errors) = run(
      s"""{"customer_id":7,"amount":1.0,"tax_amount":0.1,"discount_amount":0.0,""" +
        s""""total_amount":1.1,"transaction_channel":"UPI","is_recurring":false,""" +
        s""""transaction_datetime":"2024-03-15T10:42:31.123456","risk_score":0.1}""")
    assert(valid.isEmpty)
    assert(errors.head.getAs[String]("error") == "Missing transaction_id")
  }
}
