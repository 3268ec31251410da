package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch over a BIGINT key column: `Depth` hash rows of
  * `Width` counters; point estimate = min over rows of the key's cell.
  *
  * Unlike the Misra–Gries summary, CM is LINEAR — cells are sums, so
  * the merged sketch is bit-identical under any merge order, and the
  * DuckDB oracle reproduces the exact cell counts (and therefore the
  * exact estimates) relationally. That makes this the rare probabilistic
  * structure with full value parity, not just a guarantee invariant.
  * Hash rows are the engine's portable integer ladder
  * (((k % P) * A_d + B_d) % P % Width).
  *
  * At 100 TB: one shuffle of Depth×Width-long buffers per partition
  * (map-side combined), and the estimate never undercounts —
  * overcounts are bounded by collisions (~n/Width per row, min over
  * Depth rows).
  */
case class CountMinAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import CountMinAggregate._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Depth * Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      var d = 0
      while (d < Depth) {
        buf(d * Width + cell(k, d)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](Depth * Width)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CountMinAggregate {
  val Depth = 4
  val Width = 256
  val P = 1000000007L
  val HashA: Array[Long] = Array(31L, 131L, 1031L, 65537L)
  val HashB: Array[Long] = Array(7L, 97L, 997L, 9973L)

  /** Row-d cell of key k. floorMod keeps the index non-negative for
    * negative keys (Java % preserves the dividend's sign — a raw % would
    * index out of bounds); the SQL fragment applies the same
    * double-mod-shift so both engines hash every BIGINT identically.
    */
  def cell(k: Long, d: Int): Int =
    ((java.lang.Math.floorMod(k, P) * HashA(d) + HashB(d)) % P % Width).toInt

  /** The same cell as a SQL fragment over a key expression — identical
    * text in both dialects (integer arithmetic only).
    */
  def cellSql(k: String, d: Int): String =
    s"((($k % $P + $P) % $P) * ${HashA(d)} + ${HashB(d)}) % $P % $Width"

  /** Aggregate Column: flattened Depth×Width CM counter array. */
  def cmSketch(key: Column): Column =
    SqlBridge.column(
      CountMinAggregate(SqlBridge.expression(key)).toAggregateExpression())
}
