package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StrHashFunction

/** The v2 FunctionCatalog's load-bearing claims: resolution through the
  * catalog plumbing, the magic-method (codegen) dispatch path, arithmetic
  * identity with the portable SQL fragments, and the error contract for
  * unknown names / wrong types.
  */
class CatalogFunctionSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkTestBase.spark
    s.conf.set("spark.sql.catalog.graft_fns",
      "graft.functions.GraftFunctionCatalog")
    s
  }

  test("catalog functions resolve and match the portable arithmetic") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    df.createOrReplaceTempView("catfn_ids")
    val rows = spark.sql(
      """SELECT id, graft_fns.core.ladder_hash(id) AS h,
        |  graft_fns.core.str_hash(CAST(id AS STRING)) AS sh
        |FROM catfn_ids""".stripMargin).collect()
    for (r <- rows) {
      val id = r.getLong(0)
      assert(r.getLong(1) == graft.functions.PortableSql.seedLadder(id))
      assert(r.getLong(2) == StrHashFunction.hash(id.toString))
    }
  }

  test("magic-method dispatch: the plan invokes, not row-boxes") {
    import spark.implicits._
    (0L until 10L).toDF("id").createOrReplaceTempView("catfn_ids2")
    val df = spark.sql(
      "SELECT graft_fns.core.ladder_hash(id) AS h FROM catfn_ids2")
    // with the magic method found, analysis plants an Invoke over the
    // function instance; the ApplyFunctionExpression fallback would mean
    // produceResult + InternalRow boxing per row
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("invoke"),
      s"expected magic-method Invoke in the analyzed plan:\n$analyzed")
    assert(!analyzed.contains("ApplyFunctionExpression"),
      s"fell back to row-boxed dispatch:\n$analyzed")
  }

  test("str_hash agrees with the SQL fragment's truncation and salting") {
    // 16-codepoint truncation boundary + length salt: two strings sharing
    // a 16-char prefix must differ via the length term only
    val a = StrHashFunction.hash("0123456789abcdef")
    val b = StrHashFunction.hash("0123456789abcdefXYZ")
    assert(a != b, "length salt must distinguish same-prefix strings")
    assert(StrHashFunction.hash("") == 0L * 31L % graft.functions.PortableSql.P)
  }

  test("unknown function and wrong argument types fail loudly") {
    import spark.implicits._
    (0L until 3L).toDF("id").createOrReplaceTempView("catfn_ids3")
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_fns.core.no_such_fn(id) FROM catfn_ids3").collect()
    }
    assert(e1.getMessage.toLowerCase.contains("no_such_fn"))
    val e2 = intercept[Exception] {
      // STRING into ladder_hash(BIGINT): implicit cast may coerce, so use
      // an uncastable type (array) to force the bind failure
      spark.sql("SELECT graft_fns.core.ladder_hash(array(id)) FROM catfn_ids3")
        .collect()
    }
    assert(e2 != null)
  }

  test("listFunctions exposes the core namespace") {
    val cat = new graft.functions.GraftFunctionCatalog
    cat.initialize("graft_fns",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    val fns = cat.listFunctions(Array("core")).map(_.name).sorted
    assert(fns.sameElements(Array("ladder_hash", "str_hash")))
  }
}
