package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact per-group top-k as a native aggregate (TypedImperativeAggregate):
  * a capacity-k bounded heap per group, ordered by the struct child's FIRST
  * field descending, remaining fields ascending (the score-then-tiebreak
  * shape of every per-group ranking in this engine). All fields must be
  * numeric (long/int/double). Rows with a NULL in any ranking field are
  * SKIPPED (they never displace a real row); NaN orders greatest, like
  * Spark's sort.
  *
  * Scale rationale: the row_number-window formulation of per-group top-k
  * shuffles and sorts the ENTIRE table into |group| partitions — the
  * sparse-group window trap (3 groups ⇒ parallelism 3 at any scale; salting
  * splits the sort but still shuffles every row). This aggregate reduces
  * each map partition to ≤ k rows per group BEFORE the shuffle (classic
  * partial aggregation), so the exchange carries O(groups × partitions × k)
  * rows and nothing is globally sorted. Heap merge is associative and
  * order-independent under the total tie-break order, so results are
  * deterministic whatever the partitioning.
  */
case class TopKRows(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Array[Double]]] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(structType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType if st.fields.nonEmpty && st.fields.forall(f =>
        f.dataType == LongType || f.dataType == IntegerType || f.dataType == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"topk_rows needs struct of long/int/double fields, got $other")
  }

  // rows kept as Array[Double] internally (lossless for int and for the
  // long ids in our fixtures up to 2^53; documented constraint).
  // lazy: the child is unresolved (NullType) at construction time — only
  // after analysis (which copies via withNewChildrenInternal) is the
  // struct type known.
  private lazy val nFields = structType.fields.length

  // field types resolved ONCE (update() runs per input row of a scan built
  // for billion-row corpora — re-deriving structType and pattern-matching
  // DataType per row per field is pure hot-path waste). 0=Long 1=Int
  // 2=Double, same tag scheme in extract and eval.
  private lazy val fieldTags: Array[Int] = structType.fields.map(_.dataType match {
    case LongType => 0
    case IntegerType => 1
    case DoubleType => 2
    case other => throw new IllegalStateException(s"unsupported top-k field type $other")
  })

  /** Total order: field 0 DESC, fields 1.. ASC — via Double.compare, so
    * NaN participates in a TOTAL order (NaN greatest, NaN == NaN), matching
    * Spark's sort semantics. Raw `!=`/`>` made NaN incomparable (both
    * better(a,b) and better(b,a) false), which let insertion/merge order
    * decide the heap contents — nondeterministic under repartitioning. */
  private def better(a: Array[Double], b: Array[Double]): Boolean = {
    val c0 = java.lang.Double.compare(a(0), b(0))
    if (c0 != 0) return c0 > 0
    var i = 1
    while (i < nFields) {
      val c = java.lang.Double.compare(a(i), b(i))
      if (c != 0) return c < 0
      i += 1
    }
    false
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[Array[Double]] =
    mutable.ArrayBuffer.empty

  private def insert(buf: mutable.ArrayBuffer[Array[Double]], row: Array[Double]): Unit = {
    // capacity-k: linear insert keeps the buffer sorted best-first (k is
    // single-digit here; swap for a heap if k grows)
    var i = 0
    while (i < buf.length && better(buf(i), row)) i += 1
    if (i < k) {
      buf.insert(i, row)
      if (buf.length > k) buf.remove(k)
    }
  }

  override def update(buf: mutable.ArrayBuffer[Array[Double]],
      input: InternalRow): mutable.ArrayBuffer[Array[Double]] = {
    val v = child.eval(input)
    if (v != null) {
      val r = v.asInstanceOf[InternalRow]
      val arr = new Array[Double](nFields)
      var i = 0
      var anyNull = false
      while (i < nFields && !anyNull) {
        // a NULL ranking field must not silently read as 0 and displace a
        // real row from the top-k: rows with any NULL field are SKIPPED
        // (documented contract — build the struct from non-null columns)
        if (r.isNullAt(i)) anyNull = true
        else {
          arr(i) = fieldTags(i) match {
            case 0 =>
              val l = r.getLong(i)
              // long fields ride the heap as Double: values past 2^53 lose
              // low bits and can flip tie-breaks SILENTLY (snowflake/epoch
              // ids). Fail loudly instead — one branch per long field, paid
              // only on the update hot path, never on merge/eval.
              if (l > TopKRows.MaxExactLong || l < -TopKRows.MaxExactLong)
                throw new IllegalArgumentException(
                  s"topk_rows long field $i value $l exceeds 2^53; ranking " +
                    "fields are held as Double and would lose precision")
              l.toDouble
            case 1 => r.getInt(i).toDouble
            case _ => r.getDouble(i)
          }
        }
        i += 1
      }
      if (!anyNull) insert(buf, arr)
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[Array[Double]],
      other: mutable.ArrayBuffer[Array[Double]]): mutable.ArrayBuffer[Array[Double]] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Array[Double]]): Any = {
    val rows = buf.map { arr =>
      // `: Any` defeats Scala's numeric-branch harmonization, which would
      // silently widen the Long/Int branches to Double before boxing
      InternalRow.fromSeq(structType.fields.zipWithIndex.map[Any] { case (f, i) =>
        f.dataType match {
          case LongType => arr(i).toLong
          case IntegerType => arr(i).toInt
          case DoubleType => arr(i)
        }
      }.toSeq)
    }
    new GenericArrayData(rows.toSeq)
  }

  override def serialize(buf: mutable.ArrayBuffer[Array[Double]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * nFields * 8)
    bb.putInt(buf.length)
    buf.foreach(arr => arr.foreach(bb.putDouble))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Array[Double]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.ArrayBuffer.empty[Array[Double]]
    var i = 0
    while (i < n) {
      val arr = new Array[Double](nFields)
      var j = 0
      while (j < nFields) { arr(j) = bb.getDouble; j += 1 }
      buf += arr
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(child = newChildren.head)
}

object TopKRows {
  /** Largest long exactly representable as Double (2^53): long ranking
    * fields beyond this are rejected in update() — see the hot-path check. */
  val MaxExactLong: Long = 1L << 53

  /** `topKRows(struct($"score", $"id"), 3)` — top-3 by score desc, id asc.
    * NOTE: all ranking fields are held as Double internally; long fields
    * with |value| > 2^53 are rejected at update time (precision loss would
    * silently flip tie-breaks). */
  def topKRows(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      TopKRows(GraftColumnBridge.expression(c), k).toAggregateExpression())
  }
}
