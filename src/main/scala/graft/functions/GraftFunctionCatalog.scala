package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, DataTypes, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource-V2 FunctionCatalog — the catalog-namespaced function tier
  * next to the `SparkSessionExtensions.injectFunction` registry path
  * (GraftExtensions): functions addressed as `<catalog>.core.<name>` in
  * plain SQL, resolved through Spark's v2 catalog plumbing instead of the
  * session registry. The difference matters operationally at scale: a
  * catalog is configuration (`spark.sql.catalog.<name>=<impl class>`), so
  * every session on a 1000-executor cluster gets the same functions with
  * zero per-session registration code, and names are namespaced away from
  * user UDFs.
  *
  * Both functions implement the MAGIC_METHOD (`invoke`) contract with
  * primitive/UTF8String signatures, so Spark compiles the call into
  * whole-stage codegen as a direct method invocation — no boxing, no
  * InternalRow wrapping on the hot path (`produceResult` stays as the
  * documented fallback). Both are the engine-wide PORTABLE hash ladders
  * ([[PortableSql.seedLadder]] / [[PortableSql.strHash]]-equivalent
  * arithmetic), so a DuckDB oracle reproduces every result exactly —
  * q_catalog_fn scores the full resolve→bind→codegen→execute path
  * against that arithmetic.
  */
class GraftFunctionCatalog extends FunctionCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private val Ns = Array("core")

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    if (!namespace.sameElements(Ns) && namespace.nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        namespace)
    Array(Identifier.of(Ns, "ladder_hash"), Identifier.of(Ns, "str_hash"))
  }

  override def loadFunction(ident: Identifier): UnboundFunction =
    (ident.namespace.mkString("."), ident.name.toLowerCase) match {
      case ("core", "ladder_hash") => new LadderHashUnbound
      case ("core", "str_hash") => new StrHashUnbound
      case _ =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(
          ident)
    }
}

/** `ladder_hash(BIGINT) → BIGINT`: the Knuth seed ladder
  * ([[PortableSql.seedLadder]]) as a catalog function.
  */
class LadderHashUnbound extends UnboundFunction {
  override def name(): String = "ladder_hash"
  override def description(): String =
    "ladder_hash(id BIGINT) -> BIGINT: Knuth multiplicative ladder in [0, 1000003)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == DataTypes.LongType,
      s"ladder_hash expects (BIGINT), got $inputType")
    new LadderHashFunction
  }
}

class LadderHashFunction extends ScalarFunction[java.lang.Long] {
  override def name(): String = "ladder_hash"
  override def canonicalName(): String = "graft.core.ladder_hash"
  override def inputTypes(): Array[DataType] = Array(DataTypes.LongType)
  override def resultType(): DataType = DataTypes.LongType
  // the MAGIC method — resolved by name+signature, codegen calls it directly
  def invoke(id: Long): Long = PortableSql.seedLadder(id)
  override def produceResult(input: InternalRow): java.lang.Long =
    invoke(input.getLong(0))
}

/** `str_hash(STRING) → BIGINT`: the portable base-127 polynomial string
  * hash — Scala twin of [[PortableSql.strHash]]'s SQL fragment (first 16
  * codepoints, mod P each step, salted with the full length). Keeping the
  * arithmetic identical to the SQL fragment is the point: desynchronizing
  * them would silently split engine from oracle.
  */
class StrHashUnbound extends UnboundFunction {
  override def name(): String = "str_hash"
  override def description(): String =
    "str_hash(s STRING) -> BIGINT: portable base-127 polynomial hash in [0, 1000000007)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == DataTypes.StringType,
      s"str_hash expects (STRING), got $inputType")
    new StrHashFunction
  }
}

class StrHashFunction extends ScalarFunction[java.lang.Long] {
  override def name(): String = "str_hash"
  override def canonicalName(): String = "graft.core.str_hash"
  override def inputTypes(): Array[DataType] = Array(DataTypes.StringType)
  override def resultType(): DataType = DataTypes.LongType
  def invoke(s: UTF8String): Long = StrHashFunction.hash(s.toString)
  override def produceResult(input: InternalRow): java.lang.Long =
    invoke(input.getUTF8String(0))
}

object GraftFunctionCatalog {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** One query through the FULL v2 function path — catalog conf →
    * resolve `graft_fns.core.*` → bind → magic-method codegen → execute —
    * scored against the same ladder arithmetic replayed in DuckDB. The
    * conf set is idempotent (catalogs instantiate lazily, keyed by name).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_catalog_fn" -> ((s, dir) => {
      s.conf.set("spark.sql.catalog.graft_fns",
        "graft.functions.GraftFunctionCatalog")
      graft.Tables.orders(s, dir).createOrReplaceTempView("orders_catfn")
      s.sql("""SELECT graft_fns.core.ladder_hash(o_orderkey) % 16 AS bucket,
              |  count(*) AS n,
              |  sum(graft_fns.core.str_hash(o_orderpriority)) AS sum_sh,
              |  max(graft_fns.core.ladder_hash(o_orderkey)) AS max_h
              |FROM orders_catfn GROUP BY 1""".stripMargin)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_catalog_fn" ->
      s"""SELECT (${PortableSql.seedLadderSql("o_orderkey")}) % 16 AS bucket,
         | CAST(count(*) AS BIGINT) AS n,
         | CAST(sum(${PortableSql.strHash("o_orderpriority")}) AS BIGINT) AS sum_sh,
         | CAST(max(${PortableSql.seedLadderSql("o_orderkey")}) AS BIGINT) AS max_h
         |FROM orders GROUP BY 1""".stripMargin
  )
}

object StrHashFunction {
  /** Scala evaluation of [[PortableSql.strHash]]'s fragment: ascii() in
    * both engines returns the FIRST CODEPOINT of substr(s, i, 1), i.e.
    * the i-th codepoint of s (0 past the end), and length() counts
    * codepoints — so iterate codepoints, not UTF-16 chars.
    */
  def hash(s: String): Long = {
    val cps = s.codePoints().toArray
    var acc = 0L
    var i = 0
    while (i < 16) {
      val c = if (i < cps.length) cps(i).toLong else 0L
      acc = (acc * 127L + c) % PortableSql.P
      i += 1
    }
    (acc * 31L + cps.length.toLong) % PortableSql.P
  }
}
