package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{Fpe, FpeFunctions}

/** The native FPE Catalyst expressions must agree with the direct Fpe
  * kernel in both interpreted eval and whole-stage codegen, handle nulls,
  * and be reachable from SQL after registration.
  */
class FpeExpressionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val key = "0123456789abcdef0123456789abcdef".getBytes("UTF-8")

  test("expression token equals kernel token; decrypt inverts; null passes through") {
    import spark.implicits._
    val pans = Seq("4556737586899", "4556737586899855", "4556737586899855123", null)
    val out = pans.toDF("pan")
      .withColumn("token", FpeFunctions.fpeEncrypt(col("pan"), key))
      .withColumn("back", FpeFunctions.fpeDecrypt(
        expr("substring(token, length(token) - length(pan) + 1)"), key))
      .collect()
    pans.zip(out).foreach {
      case (null, row) =>
        assert(row.isNullAt(1) && row.isNullAt(2))
      case (pan, row) =>
        assert(row.getString(1) == Fpe.encryptPadded(key, pan))
        assert(row.getString(2) == pan)
    }
  }

  test("registered SQL functions work end-to-end") {
    FpeFunctions.register(spark)
    import spark.implicits._
    Seq("4556737586899855").toDF("pan").createOrReplaceTempView("fpe_probe")
    val row = spark.sql(
      """SELECT fpe_decrypt(fpe_encrypt(pan, X'41424344'), X'41424344') AS back,
        |       fpe_encrypt(pan, X'41424344') AS tok FROM fpe_probe""".stripMargin)
      .collect().head
    assert(row.getString(0) == "4556737586899855")
    assert(row.getString(1).length == 16 && row.getString(1).forall(_.isDigit))
  }

  test("key never renders in plan text (explain / SQL UI redaction)") {
    import spark.implicits._
    val df = Seq("4556737586899855").toDF("pan")
      .withColumn("token", FpeFunctions.fpeEncrypt(col("pan"), key))
    val plans = Seq(
      df.queryExecution.logical, df.queryExecution.analyzed,
      df.queryExecution.optimizedPlan, df.queryExecution.executedPlan)
      .map(_.toString) :+ df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExtendedMode)
    val keyHex = key.map("%02X".format(_)).mkString
    val keyAscii = new String(key, "UTF-8")
    plans.foreach { p =>
      assert(!p.contains(keyHex) && !p.toUpperCase.contains(keyHex) &&
        !p.contains(keyAscii), "key bytes leaked into plan text")
    }
    assert(plans.exists(_.contains("fpe_key(**redacted**)")))
    // and the redacted node still computes: round-trip works
    val row = df.withColumn("back", FpeFunctions.fpeDecrypt(
      expr("substring(token, length(token) - length(pan) + 1)"), key)).collect().head
    assert(row.getString(2) == "4556737586899855")
  }

  test("expression is codegen-compatible (no fallback) over many rows") {
    import spark.implicits._
    // enough rows that whole-stage codegen actually runs the generated path
    val n = (1 to 2000).map(i => f"4$i%015d")
    val ok = n.toDF("pan")
      .withColumn("token", FpeFunctions.fpeEncrypt(col("pan"), key))
      .filter(FpeFunctions.fpeDecrypt(col("token"), key) === col("pan"))
      .count()
    assert(ok == 2000L)
  }
}
