package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._

/** Bounded top-k per group as a typed aggregate: keep the k best
  * (value DESC, id ASC on ties) (value, id) pairs in a tiny buffer,
  * merged associatively — the scale replacement for the window-function
  * top-k. A window sorts EVERY group member through a shuffle
  * (rank <= k discards the rest after the sort); this aggregate
  * map-side combines to k rows per group per partition BEFORE the
  * exchange, so the shuffle carries k·groups rows instead of the whole
  * table. Same answer — the oracle runs the window form.
  *
  * Buffer ops are O(k) linear scans: for the small k of a "top N per
  * group" query that beats any heap bookkeeping.
  */
case class TopKRowsAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k >= 1, "top_k_rows requires k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_rows"

  /** (a1, i1) outranks (a2, i2): higher value, ties to the lower id. */
  private def beats(a1: Double, i1: Long, a2: Double, i2: Long): Boolean =
    a1 > a2 || (a1 == a2 && i1 < i2)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def insert(buf: ArrayBuffer[(Double, Long)], v: Double, id: Long): Unit = {
    if (buf.size < k) {
      buf += ((v, id))
    } else {
      // replace the current worst if the candidate outranks it
      var worst = 0
      var i = 1
      while (i < buf.size) {
        if (beats(buf(worst)._1, buf(worst)._2, buf(i)._1, buf(i)._2)) worst = i
        i += 1
      }
      if (beats(v, id, buf(worst)._1, buf(worst)._2)) buf(worst) = ((v, id))
    }
  }

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // NaN is skipped like null: beats() is false against NaN in both
      // directions, so one admitted NaN could never be evicted and would
      // freeze the group's top-k (callers whose values can be NaN should
      // decide its rank explicitly upstream)
      if (!row.isNullAt(0) && !row.isNullAt(1) && !row.getDouble(0).isNaN)
        insert(buf, row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(b1: ArrayBuffer[(Double, Long)], b2: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b2.foreach { case (v, id) => insert(b1, v, id) }
    b1
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val sorted = buf.sortWith { case ((v1, i1), (v2, i2)) => beats(v1, i1, v2, i2) }
    new GenericArrayData(sorted.map { case (v, id) =>
      InternalRow(v, id)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (v, id) => bb.putDouble(v); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { out += ((bb.getDouble(), bb.getLong())); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRowsAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRowsAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKAggregate {
  /** Aggregate Column: top-k (value DESC, id ASC) structs per group.
    * `pair` must be a struct(value: double, id: long) column.
    */
  def topKRows(pair: Column, k: Int): Column =
    SqlBridge.column(
      TopKRowsAggregate(SqlBridge.expression(pair), k).toAggregateExpression())
}
