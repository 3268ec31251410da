package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fpe
import graft.ingest.TxnPipeline

/** Unit tests for the ingest chain against the FIXTURES.md §1 variants:
  * valid 16-digit PAN, boundary lengths 13/19, dead-letter lengths 12/20,
  * missing card (UPI row), union-wrapped vs plain vs null encodings.
  */
class TxnPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val key = "0123456789abcdef0123456789abcdef".getBytes("UTF-8")

  private def rec(txId: String, cardJson: String): String =
    s"""{"transaction_id":"$txId","customer_id":1,"amount":100.0,
       |"tax_amount":18.0,"discount_amount":0.0,"total_amount":118.0,
       |"transaction_channel":"POS","is_recurring":false,
       |"transaction_datetime":"2024-03-15T10:42:31.123456",
       |"card_number":$cardJson,"payment_gateway_id":{"int":3},
       |"risk_score":0.2}""".stripMargin.replaceAll("\n", "")

  private def run(records: Seq[String]) = {
    import spark.implicits._
    val (valid, errors) = TxnPipeline.process(spark, records.toDF("raw"), key)
    (valid.collect().map(r => r.getString(0) -> r).toMap,
      errors.collect().map(r => r.getString(0) -> r).toMap)
  }

  test("valid PANs (13, 16, 19 digits) pass; 12 and 20 dead-letter") {
    val (valid, errors) = run(Seq(
      rec("t13", "{\"string\":\"4556737586899\"}"),
      rec("t16", "{\"string\":\"4556737586899855\"}"),
      rec("t19", "{\"string\":\"4556737586899855123\"}"),
      rec("t12", "{\"string\":\"455673758689\"}"),
      rec("t20", "{\"string\":\"45567375868998551234\"}")))
    assert(valid.keySet == Set("t13", "t16", "t19"))
    assert(errors.keySet == Set("t12", "t20"))
    assert(errors("t12").getAs[String]("error") == "Invalid Card Number")
    // original payload survives to the dead-letter table
    assert(errors("t20").getAs[String]("raw_message").contains("45567375868998551234"))
  }

  test("mask is first6 + six asterisks + last4 regardless of PAN length") {
    val (valid, _) = run(Seq(
      rec("t16", "{\"string\":\"4556737586899855\"}"),
      rec("t13", "{\"string\":\"4556737586899\"}")))
    assert(valid("t16").getAs[String]("masked_card_number") == "455673******9855")
    assert(valid("t13").getAs[String]("masked_card_number") == "455673******6899")
  }

  test("card token: FPE of the PAN, zfilled to 16, PAN never in output") {
    val (valid, _) = run(Seq(rec("t13", "{\"string\":\"4556737586899\"}")))
    val row = valid("t13")
    assert(!row.schema.fieldNames.contains("card_number"))
    val token = row.getAs[String]("card_token")
    assert(token.length == 16 && token.forall(_.isDigit))
    assert(Fpe.decrypt(key, token.substring(3)) == "4556737586899")
  }

  test("malformed JSON and missing transaction_id dead-letter with distinct labels") {
    import spark.implicits._
    val (valid, errors) = TxnPipeline.process(spark, Seq(
      rec("ok", "{\"string\":\"4556737586899855\"}"),
      "this is not json at all",
      "{\"customer_id\": 7}", // parses but no transaction_id
      // parses, no transaction_id AND a bad PAN: the id check wins
      "{\"customer_id\": 8, \"card_number\": {\"string\": \"455673758689\"}}"
    ).toDF("raw"), key)
    assert(valid.collect().map(_.getAs[String]("transaction_id")).toSet == Set("ok"))
    val errRows = errors.collect()
    assert(errRows.length == 3)
    def errorOf(raw: String): String =
      errRows.find(_.getAs[String]("raw_message") == raw).get.getAs[String]("error")
    assert(errorOf("this is not json at all") == "Malformed JSON")
    assert(errorOf("{\"customer_id\": 7}") == "Missing transaction_id")
    assert(errorOf("{\"customer_id\": 8, \"card_number\": {\"string\": \"455673758689\"}}")
      == "Missing transaction_id")
  }

  test("U1 union unwrap: wrapped, plain, and null card encodings") {
    val (valid, errors) = run(Seq(
      rec("wrapped", "{\"string\":\"4556737586899855\"}"),
      rec("plain", "\"4556737586899855\""),
      rec("nullcard", "null")))
    assert(errors.isEmpty)
    assert(valid("wrapped").getAs[String]("masked_card_number") == "455673******9855")
    assert(valid("plain").getAs[String]("masked_card_number") == "455673******9855")
    assert(valid("nullcard").getAs[String]("masked_card_number") == null)
    assert(valid("nullcard").getAs[String]("card_token") == null)
    assert(valid("nullcard").getAs[Long]("payment_gateway_id") == 3L)
  }

  test("bare-scalar row recovers EVERY field through the lazy variant fallback") {
    // A bare-scalar union field makes from_json mark the whole row
    // corrupt (PERMISSIVE is row-granular), so every projected field of
    // that row must re-derive through the variant arm — not just the
    // union columns. The plain-pgid row also exercises the bare-int leg.
    val (valid, errors) = run(Seq(
      rec("plain2", "\"4556737586899855\"")
        .replace("{\"int\":3}", "3"))) // card AND pgid both bare
    assert(errors.isEmpty, s"bare-scalar row dead-lettered: $errors")
    val r = valid("plain2")
    assert(r.getAs[Long]("customer_id") == 1L)
    assert(r.getAs[Double]("amount") == 100.0)
    assert(r.getAs[Boolean]("is_recurring") == false)
    assert(r.getAs[String]("transaction_datetime") == "2024-03-15T10:42:31.123456")
    assert(r.getAs[String]("masked_card_number") == "455673******9855")
    assert(r.getAs[Long]("payment_gateway_id") == 3L)
    assert(r.getAs[Double]("risk_score") == 0.2)
  }
}
