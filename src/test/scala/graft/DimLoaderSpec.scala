package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.lit

import graft.load.DimLoader

/** S7/S8 dimension load semantics: stem routing, schema application,
  * header skip, and WRITE_TRUNCATE behavior on re-upload.
  */
class DimLoaderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val schemaJson =
    """[{"name":"gateway_id","type":"INT64","mode":"REQUIRED"},
      |  {"name":"gateway_name","type":"STRING","mode":"REQUIRED"}]""".stripMargin

  private def write(path: String, content: String): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), content.getBytes("UTF-8"))
    ()
  }

  test("S8 routing: csv stem becomes the table, non-csv ignored") {
    assert(DimLoader.tableFor("dim_payment_gateway.csv").contains("dim_payment_gateway"))
    assert(DimLoader.tableFor("/bucket/path/dim_customer.csv").contains("dim_customer"))
    assert(DimLoader.tableFor("notes.txt").isEmpty)
    assert(DimLoader.tableFor("schema.json").isEmpty)
  }

  test("S7 load: header skipped, schema applied, re-upload truncates") {
    val tmp = Files.createTempDirectory("graft_dimspec_").toFile.getAbsolutePath
    val csv = s"$tmp/dim_test_gateway.csv"
    write(csv, "gateway_id,gateway_name\n1,PayU\n2,Razorpay\n")
    val t1 = DimLoader.loadDim(spark, csv, schemaJson)
    assert(t1 == "dim_test_gateway")
    assert(spark.table(t1).count() == 2)
    assert(spark.table(t1).schema.fieldNames.toSeq == Seq("gateway_id", "gateway_name"))

    // re-upload with different content: WRITE_TRUNCATE, not append
    write(csv, "gateway_id,gateway_name\n7,Stripe\n")
    DimLoader.loadDim(spark, csv, schemaJson)
    val rows = spark.table(t1).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("gateway_id") == 7L)
  }

  test("S8 dispatch loads every csv with a schema, skipping other files") {
    val tmp = Files.createTempDirectory("graft_dispatch_").toFile.getAbsolutePath
    write(s"$tmp/landing/dim_test_a.csv", "gateway_id,gateway_name\n1,A\n")
    write(s"$tmp/landing/readme.txt", "ignore me")
    write(s"$tmp/schemas/dim_test_a.json", schemaJson)
    val loaded = DimLoader.dispatch(spark, s"$tmp/landing", s"$tmp/schemas")
    assert(loaded == Seq("dim_test_a"))
    assert(spark.table("dim_test_a").count() == 1)
  }

  test("S12 csv lookup read applies the schema without a catalog table") {
    val tmp = Files.createTempDirectory("graft_lookup_").toFile.getAbsolutePath
    write(s"$tmp/merchants.csv", "gateway_id,gateway_name\n3,PhonePe\n4,GPay\n")
    val df = DimLoader.readCsvLookup(spark, s"$tmp/merchants.csv", schemaJson)
    assert(df.schema.fieldNames.toSeq == Seq("gateway_id", "gateway_name"))
    assert(df.collect().map(_.getAs[Long]("gateway_id")).sorted.toSeq == Seq(3L, 4L))
  }

  test("SCD1 upsert: latest version wins per key, inserts land, untouched keys pass") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    // key 1 appears TWICE in the change batch (a real CDC shape):
    // version 7 must win; key 4 is a pure insert
    val changes = Seq((1L, "a1", 5L), (1L, "a2", 7L), (4L, "d", 1L))
      .toDF("k", "v", "ver")
    val out = DimLoader.upsert(base.withColumn("ver", lit(0L)), changes, "k",
        versionCol = Some("ver"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map(
      1L -> ("a2", 7L), 2L -> ("b", 0L), 3L -> ("c", 0L), 4L -> ("d", 1L)))
  }
}
