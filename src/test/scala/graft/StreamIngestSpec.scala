package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamIngest

/** End-to-end Structured Streaming ingest: landing files → readStream →
  * foreachBatch dual sink, including stop / restart-from-checkpoint with
  * no reprocessing and no loss (ST4).
  */
class StreamIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val key = "0123456789abcdef0123456789abcdef".getBytes("UTF-8")

  private def rec(txId: String, pan: String): String = {
    val card = if (pan == null) "null" else s"""{"string":"$pan"}"""
    s"""{"transaction_id":"$txId","customer_id":1,"amount":100.0,""" +
      s""""tax_amount":18.0,"discount_amount":0.0,"total_amount":118.0,""" +
      s""""transaction_channel":"POS","is_recurring":false,""" +
      s""""transaction_datetime":"2024-03-15T10:42:31.123456",""" +
      s""""card_number":$card,"payment_gateway_id":{"int":3},"risk_score":0.2}"""
  }

  private def writeFile(dir: String, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes("UTF-8"))
    ()
  }

  test("stream ingest: dual sink, checkpointed restart resumes without reprocessing") {
    val tmp = Files.createTempDirectory("graft_stream_spec_").toFile.getAbsolutePath
    val landing = s"$tmp/landing"
    val fact = s"$tmp/fact"
    val errors = s"$tmp/errors"
    val ckpt = s"$tmp/ckpt"

    // batch 1: two valid, one short-PAN dead-letter, one malformed line
    writeFile(landing, "b1.json", Seq(
      rec("t1", "4556737586899855"),
      rec("t2", null),
      rec("bad1", "123"),
      "not json"))
    val q1 = StreamIngest.start(spark, landing, fact, errors, ckpt, key,
      availableNow = true)
    q1.awaitTermination()

    val fact1 = StreamIngest.readSink(spark, fact)
    val err1 = StreamIngest.readSink(spark, errors)
    assert(fact1.collect().map(_.getAs[String]("transaction_id")).toSet
      == Set("t1", "t2"))
    assert(err1.count() == 2)
    assert(err1.collect().map(_.getAs[String]("error")).sorted.toSeq
      == Seq("Invalid Card Number", "Malformed JSON"))

    // batch 2 arrives after the stream stopped; restart from the SAME
    // checkpoint must pick up only the new file.
    writeFile(landing, "b2.json", Seq(
      rec("t3", "4556737586899"),
      rec("bad2", "45567375868998551234")))
    val q2 = StreamIngest.start(spark, landing, fact, errors, ckpt, key,
      availableNow = true)
    q2.awaitTermination()

    val factAll = StreamIngest.readSink(spark, fact).collect()
    assert(factAll.map(_.getAs[String]("transaction_id")).sorted.toSeq
      == Seq("t1", "t2", "t3")) // t1/t2 exactly once: batch 1 not replayed
    assert(StreamIngest.readSink(spark, errors).count() == 3)

    // the valid sink carries the full U9 projection incl. mask + token
    val t1 = factAll.find(_.getAs[String]("transaction_id") == "t1").get
    assert(t1.getAs[String]("masked_card_number") == "455673******9855")
    assert(t1.getAs[String]("card_token").length == 16)
    assert(!t1.schema.fieldNames.contains("card_number"))
  }
}
