package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra-Gries heavy-hitters sketch as a native aggregate function
  * (TypedImperativeAggregate) — the frequent-items counterpart to the
  * approx sketches the reference leaned on (approx_distinct /
  * approx_percentile, partitioning.py:113,255), which Spark lacks as a
  * built-in. Returns the retained (key, count) pairs sorted by
  * (count desc, key asc); callers explode + limit for a top-N.
  *
  * Guarantees (standard MG): every key with true frequency > n/capacity is
  * retained, and each reported count is within n/capacity of truth
  * (under-estimate only). With capacity ≥ |distinct keys| no decrement ever
  * fires and counts are exact regardless of partitioning/merge order —
  * which is what makes the `agg_heavy_hitters` DuckDB oracle a full
  * hash-compare at fixture scale while the sketch stays O(capacity) at
  * 100 TB (per-partition partials merge associatively; no shuffle of raw
  * keys, only capacity-bounded maps).
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    // capacity is validated HERE (analysis time) rather than in add():
    // capacity <= 0 would otherwise surface executor-side as an
    // UnsupportedOperationException("empty.min") deep inside a retried task
    if (capacity <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters capacity must be positive, got $capacity")
    else child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"heavy_hitters needs bigint/int, got $other")
    }

  override def createAggregationBuffer(): mutable.LongMap[Long] = mutable.LongMap.empty

  private def add(buf: mutable.LongMap[Long], key: Long, inc: Long): Unit = {
    if (buf.contains(key)) buf.update(key, buf(key) + inc)
    else if (buf.size < capacity) buf.update(key, inc)
    else {
      // Misra-Gries decrement step: subtract the smallest retained count
      // (generalized for weighted/merge increments), dropping zeros.
      val dec = math.min(inc, buf.values.min)
      val dead = mutable.ArrayBuffer[Long]()
      buf.foreachEntry { (k, v) => if (v <= dec) dead += k else buf.update(k, v - dec) }
      dead.foreach(buf.remove)
      if (inc > dec && buf.size < capacity) buf.update(key, inc - dec)
    }
  }

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v match {
        case i: Int => i.toLong
        case l: Long => l
      }
      add(buf, key, 1L)
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Long],
      other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreachEntry { (k, v) => add(buf, k, v) }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (k, v) => (-v, k) }
    new GenericArrayData(sorted.map { case (k, v) => InternalRow(k, v) })
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreachEntry { (k, v) => bb.putLong(k); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { buf.update(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren.head)
}

object HeavyHitters {
  /** Column-level entry point: `heavyHitters($"user_id", 4096)`. */
  def heavyHitters(c: Column, capacity: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      HeavyHitters(GraftColumnBridge.expression(c), capacity).toAggregateExpression())
  }
}
