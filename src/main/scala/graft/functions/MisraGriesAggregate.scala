package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType}

/** Misra–Gries heavy-hitters sketch over a BIGINT key column: at most
  * `capacity` counters, updated in O(1), merged associatively — the
  * frequent-items analog of the HLL/KLL sketches already in the engine
  * (q_approx_distinct / q_approx_quantiles).
  *
  * Guarantees (the oracle-checkable part — the sketch CONTENT depends on
  * merge order, the guarantees never do):
  *   - every key with true frequency > n/(capacity+1) is in the summary;
  *   - each reported count undercounts by at most n/(capacity+1).
  *
  * Update: increment a present key; insert if a slot is free; otherwise
  * decrement ALL counters (dropping zeros) — the classic n/(k+1) charge
  * argument. Merge (Agarwal et al., "Mergeable Summaries", PODS'12):
  * add counts pairwise, then subtract the (capacity+1)-th largest count
  * from every counter and drop non-positives — restores the size bound
  * while the per-key undercount stays within the summed bounds.
  *
  * At 100 TB this is a map-side-combined single shuffle of K-entry
  * buffers per partition — the only way "top keys of a petabyte column"
  * is answerable without a full groupBy of the key domain.
  */
case class MisraGriesAggregate(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(capacity >= 1, "misra_gries capacity must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(LongType, LongType, valueContainsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      if (buf.contains(k)) buf(k) += 1L
      else if (buf.size < capacity) buf(k) = 1L
      else {
        // decrement-all: each stored counter pays one; zeros drop out
        val dead = buf.iterator.collect { case (key, 1L) => key }.toArray
        buf.transformValuesInPlace(_ - 1L)
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.LongMap[Long], b2: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b2.foreach { case (k, c) => b1(k) = b1.getOrElse(k, 0L) + c }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positives
      val counts = b1.values.toArray.sortInPlace()(Ordering[Long].reverse)
      val sub = counts(capacity)
      val dead = b1.iterator.collect { case (k, c) if c <= sub => k }.toArray
      dead.foreach(b1.remove)
      b1.transformValuesInPlace(_ - sub)
    }
    b1
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    // sorted by key so the map's iteration order is stable (the query
    // layer only does membership/estimate lookups, but a stable sketch
    // makes debugging dumps reproducible)
    val entries = buf.toArray.sortBy(_._1)
    ArrayBasedMapData(entries.map(_._1), entries.map(_._2))
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { out(bb.getLong()) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGriesAggregate {
  /** Aggregate Column: Misra–Gries summary map of a BIGINT key column. */
  def mgSketch(key: Column, capacity: Int): Column =
    SqlBridge.column(
      MisraGriesAggregate(SqlBridge.expression(key), capacity).toAggregateExpression())
}
