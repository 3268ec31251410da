package graft

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** TEST-ONLY stand-in for the `kafka` data source (the spark-sql-kafka
  * connector is not on this sandbox's classpath, so without it the
  * Kafka branch of StreamIngest.readWireStream cannot even be
  * ANALYZED). The stub registers the same `kafka` short name on the
  * test classpath only and exposes the connector's documented wire
  * schema (key/value/topic/partition/offset/timestamp/timestampType),
  * which lets KafkaPlanSpec drive the real analyzer over our branch —
  * resolving the source, validating the projection, and capturing the
  * reader options our code sets — with no broker and no execution
  * (newScanBuilder throws; analysis never calls it).
  */
object KafkaStubSource {
  /** Options captured at the last schema inference, lower-cased keys. */
  @volatile var lastOptions: Map[String, String] = Map.empty

  /** The public schema every Kafka source row carries (Structured
    * Streaming + Kafka integration guide).
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))
}

class KafkaStubProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    KafkaStubSource.lastOptions = options.entrySet().asScala
      .map(e => e.getKey.toLowerCase(java.util.Locale.ROOT) -> e.getValue).toMap
    KafkaStubSource.wireSchema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new Table with SupportsRead {
    override def name(): String = "kafka-stub"
    override def schema(): StructType = KafkaStubSource.wireSchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      throw new UnsupportedOperationException(
        "KafkaStubProvider is analysis-only: it validates plan shape, never reads")
  }
}
