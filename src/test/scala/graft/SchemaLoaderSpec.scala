package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.SchemaLoader

/** Schema loader behavior per reference semantics: bare-list wrapping
  * (pipeline.py:135-141), REQUIRED → non-nullable, BQ type mapping.
  */
class SchemaLoaderSpec extends AnyFunSuite {

  private val factSchemaJson =
    """[
      | {"name": "transaction_id", "type": "STRING", "mode": "REQUIRED"},
      | {"name": "customer_id", "type": "INT64", "mode": "REQUIRED"},
      | {"name": "amount", "type": "FLOAT64", "mode": "REQUIRED"},
      | {"name": "is_recurring", "type": "BOOLEAN", "mode": "REQUIRED"},
      | {"name": "card_token", "type": "STRING", "mode": "NULLABLE"},
      | {"name": "payment_gateway_id", "type": "INT64", "mode": "NULLABLE"},
      | {"name": "date_of_birth", "type": "DATE"}
      |]""".stripMargin

  test("bare field list parses (the reference wraps bare lists itself)") {
    val st = SchemaLoader.fromJson(factSchemaJson)
    assert(st.fields.length == 7)
    assert(st("transaction_id") == StructField("transaction_id", StringType, nullable = false))
    assert(st("customer_id").dataType == LongType)
    assert(st("amount").dataType == DoubleType)
    assert(st("is_recurring").dataType == BooleanType)
    assert(st("date_of_birth").dataType == DateType)
  }

  test("wrapped {fields: [...]} object parses identically") {
    val wrapped = s"""{"fields": $factSchemaJson}"""
    assert(SchemaLoader.fromJson(wrapped) == SchemaLoader.fromJson(factSchemaJson))
  }

  test("mode semantics: REQUIRED non-nullable, NULLABLE/absent nullable") {
    val st = SchemaLoader.fromJson(factSchemaJson)
    assert(!st("transaction_id").nullable)
    assert(st("card_token").nullable)
    assert(st("date_of_birth").nullable)
  }

  test("unknown type rejected") {
    intercept[IllegalArgumentException](
      SchemaLoader.fromJson("""[{"name": "x", "type": "GEOGRAPHY"}]"""))
  }
}
