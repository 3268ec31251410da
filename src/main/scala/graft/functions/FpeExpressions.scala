package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, LeafExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, EmptyBlock, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for FPE tokenization (U6) — the codegen
  * upgrade over the scalar UDF the reference's DoFn implies (SURVEY §2.9).
  *
  * A UDF in the ingest hot path breaks whole-stage codegen: Spark must
  * convert the internal row to Scala objects, invoke the closure, and
  * convert back, per row. These expressions instead emit a direct static
  * call into [[Fpe]] inside the generated code, so the
  * parse→validate→mask→tokenize→project chain stays ONE codegen stage
  * with no boxing boundary.
  *
  * Null semantics follow BinaryExpression's null-safe default (null in →
  * null out), matching `when(col.isNotNull, udf(col))`.
  */
case class FpeEncryptExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "fpe_encrypt"

  override protected def nullSafeEval(pan: Any, key: Any): Any =
    UTF8String.fromString(Fpe.encryptPadded(
      key.asInstanceOf[Array[Byte]], pan.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (pan, key) =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Fpe.encryptPadded($key, $pan.toString()))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Inverse of [[FpeEncryptExpression]] over raw digit strings (callers
  * strip the zfill padding first — the padded-token inverse needs the
  * original length, see IngestQueries.q_fpe_roundtrip).
  */
case class FpeDecryptExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "fpe_decrypt"

  override protected def nullSafeEval(digits: Any, key: Any): Any =
    UTF8String.fromString(Fpe.decrypt(
      key.asInstanceOf[Array[Byte]], digits.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (digits, key) =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Fpe.decrypt($key, $digits.toString()))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The DEK as a plan node that NEVER renders its bytes: `toString`/`sql`
  * print a fixed redaction marker, so `df.explain()`, the SQL UI, and
  * event logs of a PII-tokenization plan carry no key material. A plain
  * `Literal(key)` prints the key as hex in all three.
  *
  * Deliberately NOT foldable: ConstantFolding would collapse a foldable
  * key node back into a `Literal`, un-redacting it. Codegen ships the
  * key via `addReferenceObj` (a per-task object reference — the same
  * once-per-task delivery a broadcast variable gives a DoFn.setup key,
  * U7), so the generated Java source carries a reference, not bytes.
  */
case class RedactedKeyLiteral(key: Array[Byte]) extends LeafExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = key

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fpeKey", key, "byte[]")
    ev.copy(code = EmptyBlock, isNull = FalseLiteral,
      value = JavaCode.global(ref, BinaryType))
  }

  override def toString: String = "fpe_key(**redacted**)"
  override def sql: String = "fpe_key('**redacted**')"

  // Array[Byte] is reference-equal in case-class equality; compare by
  // value so identical keys are one plan node for cache/reuse matching.
  override def equals(other: Any): Boolean = other match {
    case RedactedKeyLiteral(k) => java.util.Arrays.equals(key, k)
    case _ => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(key)
}

/** Column-API and SQL-registry entry points for the FPE expressions. */
object FpeFunctions {

  /** Tokenize: FPE-encrypt + zfill(16) (pipeline.py:92-95). The key rides
    * as a redacted leaf node — shipped once per task binary like a
    * broadcast variable (U7), and never rendered in plan text.
    */
  def fpeEncrypt(pan: Column, key: Array[Byte]): Column =
    SqlBridge.column(
      FpeEncryptExpression(SqlBridge.expression(pan), RedactedKeyLiteral(key)))

  def fpeDecrypt(digits: Column, key: Array[Byte]): Column =
    SqlBridge.column(
      FpeDecryptExpression(SqlBridge.expression(digits), RedactedKeyLiteral(key)))

  private val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "fpe_encrypt" -> (children => FpeEncryptExpression(children(0), children(1))),
    "fpe_decrypt" -> (children => FpeDecryptExpression(children(0), children(1))))

  /** Imperative registration for sessions not built with the extension
    * (e.g. driver-owned sessions): makes `fpe_encrypt(pan, key)` /
    * `fpe_decrypt(digits, key)` available to spark.sql.
    */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, builder) =>
      SqlBridge.registerFunction(spark, name,
        new ExpressionInfo(classOf[FpeEncryptExpression].getName, name),
        builder)
    }
}

/** SparkSessionExtensions hook: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions` exposes the
  * engine's native functions to pure-SQL users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator tier: the native as-of join planner rule
    ext.injectPlannerStrategy(_ => graft.plans.AsofStrategy)
    // optimizer tier: quadratic band joins → bucketed equi-joins
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    Seq(
      ("fpe_encrypt", (children: Seq[Expression]) => FpeEncryptExpression(children(0), children(1))),
      ("fpe_decrypt", (children: Seq[Expression]) => FpeDecryptExpression(children(0), children(1)))
    ).foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[FpeEncryptExpression].getName, name),
        builder))
    }
  }
}
