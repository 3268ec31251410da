package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise sum of fixed-width BIGINT arrays as a native typed
  * aggregate (the §2.9 UDAF surface): one mutable `Array[Long]` buffer
  * per group, updated in place, merged associatively — so the k-means
  * centroid update is ONE partial-aggregated shuffle of K×dim-long
  * buffers instead of a posexplode (rows × dim) + per-component groupBy
  * + array rebuild. Integer adds are exact and order-insensitive, which
  * is what keeps the DuckDB oracle's per-component sums bit-identical.
  *
  * Null inputs are skipped (sum()'s null-ignoring convention); a
  * wrong-width array THROWS — silently skipping one would zero whole
  * groups and e.g. freeze k-means at its seed centroids with no error
  * anywhere downstream.
  */
case class LongVectorSumAggregate(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_sum_long"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"vec_sum_long(dim=$dim) got an array of width ${arr.numElements()}")
      var i = 0
      while (i < dim) { buf(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * dim)
    var i = 0
    while (i < dim) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](dim)
    var i = 0
    while (i < dim) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVectorSumAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVectorSumAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorAggregates {
  /** Aggregate Column: element-wise sum of `dim`-wide BIGINT arrays. */
  def vecSumLong(arr: Column, dim: Int): Column =
    SqlBridge.column(
      LongVectorSumAggregate(SqlBridge.expression(arr), dim).toAggregateExpression())
}
