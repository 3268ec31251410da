package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The partition transforms as catalog-resolvable V2 FUNCTIONS (r19
  * storage-partitioned joins over transforms).
  *
  * When a scan reports `KeyGroupedPartitioning(bucket(8, key), ...)`,
  * Spark's `V2ScanPartitioningAndOrdering` rule resolves the named
  * transform through the owning catalog's FunctionCatalog face —
  * `loadFunction(Identifier.of(Array.empty, "bucket"))`, bound against
  * (numBuckets INT, keyType) — and only a successful bind turns the
  * report into a catalyst `TransformExpression` two scans can be
  * co-partitioned on. These functions exist for THAT resolution (and
  * the planner's occasional evaluation of a partition value); the hot
  * path never calls them — data files are routed by the task writer
  * ([[PartitionTransforms.Spec.eval]]) and partition keys come from
  * verified stats/claims ([[ManifestScan]]).
  *
  * Each function delegates to the SAME [[PartitionTransforms]] kernel
  * the writer uses, so a planner-evaluated transform value can never
  * disagree with the routing that laid out the files — the property
  * SPJ correctness stands on. `canonicalName` is stable and shared by
  * both join sides (Spark's co-partition check compares it).
  */
object TransformFunctions {

  val Names: Seq[String] =
    Seq("bucket", "years", "months", "days", "hours", "truncate")

  def load(name: String): UnboundFunction =
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "bucket" => new BucketUnbound
      case "days" => new DaysUnbound
      case u @ ("years" | "months" | "hours") => new TemporalUnbound(u)
      case "truncate" => new TruncateUnbound
      case other => throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(
          org.apache.spark.sql.connector.catalog.Identifier.of(
            Array.empty[String], other))
    }

  private def integral(dt: DataType): Boolean =
    dt == IntegerType || dt == LongType

  private[sources] def cellAsLong(row: InternalRow, i: Int,
      dt: DataType): Long =
    if (dt == IntegerType) row.getInt(i).toLong else row.getLong(i)

  class BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(numBuckets INT, col BIGINT|INT|STRING) -> INT: the " +
        "engine's splitmix partition hash modulo numBuckets"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
        integral(inputType.fields(0).dataType) &&
        (integral(inputType.fields(1).dataType) ||
          inputType.fields(1).dataType == StringType),
        s"bucket expects (numBuckets INT, col BIGINT|INT|STRING), got $inputType")
      new BucketBound(inputType.fields(0).dataType,
        inputType.fields(1).dataType)
    }
  }

  class BucketBound(nType: DataType, colType: DataType)
      extends ScalarFunction[java.lang.Integer] {
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def inputTypes(): Array[DataType] = Array(nType, colType)
    override def resultType(): DataType = IntegerType
    override def produceResult(input: InternalRow): java.lang.Integer = {
      val n = cellAsLong(input, 0, nType).toInt
      val cell: Any =
        if (colType == StringType) input.getUTF8String(1)
        else cellAsLong(input, 1, colType)
      PartitionTransforms.Bucket(n, "").eval(cell)
        .asInstanceOf[Long].toInt
    }
  }

  class DaysUnbound extends UnboundFunction {
    override def name(): String = "days"
    override def description(): String =
      "days(ts BIGINT) -> BIGINT: epoch-millis floored to the epoch day"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1 &&
        integral(inputType.fields(0).dataType),
        s"days expects one integral epoch-millis column, got $inputType")
      new DaysBound(inputType.fields(0).dataType)
    }
  }

  class DaysBound(colType: DataType) extends ScalarFunction[java.lang.Long] {
    override def name(): String = "days"
    override def canonicalName(): String = "graft.days"
    override def inputTypes(): Array[DataType] = Array(colType)
    override def resultType(): DataType = LongType
    override def produceResult(input: InternalRow): java.lang.Long =
      PartitionTransforms.Days("").eval(cellAsLong(input, 0, colType))
        .asInstanceOf[Long]
  }

  /** The rest of the temporal family (r19 continuation): years / months
    * / hours over epoch-millis, one shared shape — each delegates to
    * the [[PartitionTransforms]] kernel of the same name so the
    * planner-evaluated ordinal always matches the writer's file
    * routing, exactly like days.
    */
  class TemporalUnbound(unit: String) extends UnboundFunction {
    override def name(): String = unit
    override def description(): String =
      s"$unit(ts BIGINT) -> BIGINT: epoch-millis floored to the epoch " +
        s"$unit ordinal (UTC proleptic-Gregorian calendar for " +
        "years/months)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1 &&
        integral(inputType.fields(0).dataType),
        s"$unit expects one integral epoch-millis column, got $inputType")
      new TemporalBound(unit, inputType.fields(0).dataType)
    }
  }

  class TemporalBound(unit: String, colType: DataType)
      extends ScalarFunction[java.lang.Long] {
    private val spec = PartitionTransforms.parse(s"$unit(c)")
    override def name(): String = unit
    override def canonicalName(): String = s"graft.$unit"
    override def inputTypes(): Array[DataType] = Array(colType)
    override def resultType(): DataType = LongType
    override def produceResult(input: InternalRow): java.lang.Long =
      spec.eval(cellAsLong(input, 0, colType)).asInstanceOf[Long]
  }

  class TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(width INT, col BIGINT|INT|STRING) -> the floor bucket " +
        "origin (integral) or leading-width prefix (string)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2 &&
        integral(inputType.fields(0).dataType) &&
        (integral(inputType.fields(1).dataType) ||
          inputType.fields(1).dataType == StringType),
        s"truncate expects (width INT, col BIGINT|INT|STRING), got $inputType")
      new TruncateBound(inputType.fields(0).dataType,
        inputType.fields(1).dataType)
    }
  }

  class TruncateBound(wType: DataType, colType: DataType)
      extends ScalarFunction[AnyRef] {
    override def name(): String = "truncate"
    override def canonicalName(): String = "graft.truncate"
    override def inputTypes(): Array[DataType] = Array(wType, colType)
    override def resultType(): DataType =
      if (colType == StringType) StringType else LongType
    override def produceResult(input: InternalRow): AnyRef = {
      val w = cellAsLong(input, 0, wType)
      val t = PartitionTransforms.Truncate(w, "")
      if (colType == StringType)
        UTF8String.fromString(
          t.eval(input.getUTF8String(1)).asInstanceOf[String])
      else java.lang.Long.valueOf(
        t.eval(cellAsLong(input, 1, colType)).asInstanceOf[Long])
    }
  }
}
