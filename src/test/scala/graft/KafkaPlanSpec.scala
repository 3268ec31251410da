package graft

import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamIngest

/** Plan-only integration check of the Kafka ingest branch (VERDICT r4
  * ask #7): no broker exists in this sandbox, so the spec resolves and
  * ANALYZES the Kafka read through a test-classpath stub source (see
  * KafkaStubProvider) and asserts the two things that can drift —
  * the reader options the branch sets, and the projection from the
  * connector's wire schema down to the single `raw` string column that
  * TxnPipeline consumes.
  */
class KafkaPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("Kafka branch analyzes: wire options reach the source, projection is raw:string") {
    val df = StreamIngest.readWireStream(spark, StreamIngest.KafkaTopic(
      bootstrapServers = "broker-1:9092,broker-2:9092",
      topic = "txn_wire",
      startingOffsets = "earliest",
      extraOptions = Map("maxOffsetsPerTrigger" -> "5000")))

    // forces analysis: the stub's wire schema resolves, the branch's
    // cast+alias projects it to exactly the file branch's shape
    assert(df.schema == StructType(Seq(StructField("raw", StringType))))
    assert(df.isStreaming, "the Kafka branch must produce a STREAMING frame")

    val o = KafkaStubSource.lastOptions
    assert(o.get("kafka.bootstrap.servers").contains("broker-1:9092,broker-2:9092"))
    assert(o.get("subscribe").contains("txn_wire"))
    assert(o.get("startingoffsets").contains("earliest"))
    assert(o.get("maxoffsetspertrigger").contains("5000"),
      "extraOptions must pass through to the reader")
  }

  test("file and Kafka branches surface one schema, so the pipeline is source-agnostic") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_kafka_plan_").toFile
    java.nio.file.Files.writeString(tmp.toPath.resolve("w.json"), "{}")
    val fileDf = StreamIngest.readWireStream(spark, StreamIngest.FileLanding(tmp.getAbsolutePath))
    val kafkaDf = StreamIngest.readWireStream(spark, StreamIngest.KafkaTopic("b:9092", "t"))
    assert(fileDf.schema == kafkaDf.schema)
  }
}
