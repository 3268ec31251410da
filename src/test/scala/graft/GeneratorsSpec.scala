package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.gen.Generators

/** Distribution + constraint invariants of the deterministic generators
  * (the reference reproduces these semantics via Python random; we assert
  * them over the columnar output).
  */
class GeneratorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val acct = Generators.accounts(spark, dir).cache()
  private lazy val fact = Generators.factTransactions(spark, dir).cache()

  test("J1: open >= signup; close only for Closed accounts, in (open, 730]") {
    assert(acct.filter(col("open_date_id") < col("signup_date_id")).count() == 0)
    assert(acct.filter(col("close_date_id").isNotNull =!=
      (col("account_status") === "Closed")).count() == 0)
    assert(acct.filter(col("close_date_id").isNotNull &&
      (col("close_date_id") <= col("open_date_id") ||
        col("close_date_id") > Generators.OpenEndDay)).count() == 0)
  }

  test("segment and status ladders roughly match the target weights") {
    val n = acct.count().toDouble
    val segShare = acct.groupBy("customer_segment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    assert(math.abs(segShare("Retail Banking") - 0.45) < 0.05)
    assert(math.abs(segShare.getOrElse("Mass Affluent", 0.0) - 0.15) < 0.04)
    val closedShare = acct.filter(col("account_status") === "Closed").count() / n
    assert(math.abs(closedShare - 0.10) < 0.03)
  }

  test("account types always belong to the account's segment") {
    val allowed = Generators.segmentTypes.toMap
    val bad = acct.collect().filterNot(r =>
      allowed(r.getAs[String]("customer_segment"))
        .contains(r.getAs[String]("account_type")))
    assert(bad.isEmpty)
  }

  test("J2: every txn date falls inside its account's [open, close] window") {
    assert(fact.filter(col("txn_date_id") < col("open_date_id") ||
      (col("close_date_id").isNotNull &&
        col("txn_date_id") > col("close_date_id"))).count() == 0)
  }

  test("money: totals exact, amounts in the per-type bands, 2dp") {
    assert(fact.filter(
      abs(col("total_amount") - (col("amount") + col("tax_amount") -
        col("discount_amount"))) > 1e-9).count() == 0)
    val prem = fact.filter(!col("is_recurring") &&
      col("account_type").isin("Private Banking Account", "Business Credit Card"))
    assert(prem.filter(col("amount") < 10000.0 || col("amount") > 50000.0).count() == 0)
    val std = fact.filter(col("is_recurring") ||
      !col("account_type").isin("Private Banking Account", "Business Credit Card"))
    assert(std.filter(col("amount") < 50.0 || col("amount") > 5000.0).count() == 0)
    assert(fact.filter(col("tax_amount") > col("amount") * 0.18).count() == 0)
    // ~10% of rows carry a discount
    val discShare = fact.filter(col("discount_amount") > 0).count().toDouble / fact.count()
    assert(discShare > 0.05 && discShare < 0.15)
  }

  test("ladders: recurring only on card accounts; gateway/device/risk rules") {
    assert(fact.filter(col("is_recurring") &&
      !(lower(col("account_type")).contains("credit card") ||
        lower(col("account_type")).contains("debit card"))).count() == 0)
    assert(fact.filter(col("is_recurring") &&
      col("transaction_channel") =!= "Online Payment Gateway").count() == 0)
    assert(fact.filter(col("payment_gateway_id").isNull ===
      col("transaction_channel").isin("POS", "Online Payment Gateway")).count() == 0)
    assert(fact.filter(col("transaction_channel") === "POS" &&
      col("device_type_id") =!= 7).count() == 0)
    val n = fact.count().toDouble
    val highRisk = fact.filter(col("risk_score") >= 0.60).count() / n
    assert(math.abs(highRisk - 0.20) < 0.04)
    assert(fact.filter(col("risk_score") < 0.0 || col("risk_score") > 1.0).count() == 0)
  }

  test("transaction ids: 20 lowercase hex chars, unique") {
    val ids = fact.select("transaction_id").collect().map(_.getString(0))
    assert(ids.forall(id => id.length == 20 && id.forall(c =>
      c.isDigit || ('a' to 'f').contains(c))))
    assert(ids.distinct.length == ids.length)
  }

  private lazy val cust = Generators.customers(spark, dir).cache()

  test("customers: email derives from the name, phone is +91 mobile shaped") {
    assert(cust.filter(col("email") =!=
      concat(lower(col("first_name")), lit("."), lower(col("last_name")),
        lit("@example.com"))).count() == 0)
    assert(cust.filter(!col("phone").rlike("^\\+91-[6-9][0-9]{9}$")).count() == 0)
  }

  test("customers: DOB 18-70y before base, signup in (2023-01-01, 2024-12-31]") {
    val base = to_date(lit("2023-01-01"))
    val age = datediff(base, col("date_of_birth"))
    assert(cust.filter(age < 18 * 365 || age > 70 * 365 + 30).count() == 0)
    assert(cust.filter(col("signup_date_id") < 1 ||
      col("signup_date_id") > Generators.OpenEndDay).count() == 0)
  }

  test("customers: status ladder ~75/10/10/5 and location triple consistent") {
    val n = cust.count().toDouble
    val active = cust.filter(col("customer_status") === "Active").count() / n
    assert(math.abs(active - 0.75) < 0.05)
    val triples = cust.select("city", "state", "pincode").distinct().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(triples.subsetOf(Generators.locations.toSet))
    assert(triples.size > 10) // draws actually spread across the pool
  }

  test("customers: address lines follow the reference's construction") {
    assert(cust.filter(!col("address_line_1")
      .rlike("^(Room No\\.|Flat No\\.) [0-9]{1,3}, (Apt\\.|Floor) [0-9]{1,2}$"))
      .count() == 0)
    val streets = cust.select("address_line_2").distinct().collect()
      .map(_.getString(0)).toSet
    assert(streets.subsetOf(Generators.streetNames.toSet))
  }
}
