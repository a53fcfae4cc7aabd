package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-shingle kernels (opt-r15). The dataflow forms —
  * `transform(sequence(…), i -> concat_ws(" ", slice(split(text," "), i, w)))`
  * plus `array_distinct` / `xxhash64` on top — run the per-window lambda
  * INTERPRETED (higher-order functions are CodegenFallback) and allocate a
  * fresh w-token string per window, duplicates included, only to dedup or
  * hash it immediately. These kernels walk the text bytes once instead:
  * `split(text, " ")` token boundaries are recovered byte-level (0x20 never
  * occurs inside a UTF-8 multi-byte sequence), and each w-token window is a
  * CONTIGUOUS substring of the original text (adjacent tokens are separated
  * by exactly one space, so `concat_ws(" ", slice(toks, j, w))` re-assembles
  * the very bytes it came from) — a zero-copy `UTF8String.fromAddress` view
  * hashes, dedups and emits without materializing per-window strings. Views
  * are safe to return for the same reason `Substring`'s are: every consumer
  * copies expression output into an UnsafeRow within the producing row's
  * scope. Bit-identical to the HOF forms (ShinglerSpec pins equality
  * including empty tokens from doubled/leading/trailing spaces, multi-byte
  * codepoints, and the `< w` whole-text collapse). */
object Shingler {

  /** Token start BYTE offsets under `split(text, " ")` semantics (single
    * literal space, all empty tokens kept — Spark splits with limit -1). */
  private def tokenStarts(s: UTF8String): Array[Int] = {
    val n = s.numBytes
    var count = 1
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) count += 1
      i += 1
    }
    val starts = new Array[Int](count)
    var c = 1
    i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) { starts(c) = i + 1; c += 1 }
      i += 1
    }
    starts
  }

  // window j covers tokens j..j+w-1 = bytes [starts(j), tokEnd(j+w-1))
  @inline private def tokEnd(starts: Array[Int], n: Int, t: Int): Int =
    if (t + 1 < starts.length) starts(t + 1) - 1 else n

  /** == `Dedup.shingles(text, w)`: every w-token window (whole text when
    * under w tokens), duplicates and order preserved. */
  def shingleArray(text: UTF8String, w: Int): ArrayData = {
    val starts = tokenStarts(text)
    val m = starts.length
    val n = text.numBytes
    if (m < w) return new GenericArrayData(Array[Any](text))
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val out = new Array[Any](m - w + 1)
    var j = 0
    while (j < m - w + 1) {
      val sb = starts(j)
      val eb = tokEnd(starts, n, j + w - 1)
      out(j) = UTF8String.fromAddress(base, off + sb, eb - sb)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** == `transform(Dedup.shingles(text, w), xxhash64)`: per-window 64-bit
    * hash, positions and duplicates preserved — the positional-fingerprint
    * input (winnowing) with no window strings materialized. */
  def shingleHashes(text: UTF8String, w: Int): ArrayData = {
    val starts = tokenStarts(text)
    val m = starts.length
    val n = text.numBytes
    if (m < w)
      return UnsafeArrayData.fromPrimitiveArray(
        Array(XXH64.hashUTF8String(text, 42L)))
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val out = new Array[Long](m - w + 1)
    var j = 0
    while (j < m - w + 1) {
      val sb = starts(j)
      val eb = tokEnd(starts, n, j + w - 1)
      out(j) = XXH64.hashUTF8String(
        UTF8String.fromAddress(base, off + sb, eb - sb), 42L)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** == `array_distinct(Dedup.shingles(text, w))`: first-occurrence order,
    * string identity (views into the text, deduped via their byte
    * hash/equality — no per-window allocation beyond the set nodes). */
  def distinctShingles(text: UTF8String, w: Int): ArrayData = {
    val starts = tokenStarts(text)
    val m = starts.length
    val n = text.numBytes
    if (m < w) return new GenericArrayData(Array[Any](text))
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val seen = new java.util.HashSet[UTF8String](Math.max(8, (m - w + 1) * 2))
    val out = new scala.collection.mutable.ArrayBuffer[Any](m - w + 1)
    var j = 0
    while (j < m - w + 1) {
      val sb = starts(j)
      val eb = tokEnd(starts, n, j + w - 1)
      val v = UTF8String.fromAddress(base, off + sb, eb - sb)
      if (seen.add(v)) out += v
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** == `transform(array_distinct(Dedup.shingles(text, w)), xxhash64)`:
    * dedup on STRING identity (so collision behavior matches the dataflow
    * form exactly), then one xxhash64 per distinct window. */
  def distinctShingleHashes(text: UTF8String, w: Int): ArrayData = {
    val starts = tokenStarts(text)
    val m = starts.length
    val n = text.numBytes
    if (m < w)
      return UnsafeArrayData.fromPrimitiveArray(
        Array(XXH64.hashUTF8String(text, 42L)))
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val seen = new java.util.HashSet[UTF8String](Math.max(8, (m - w + 1) * 2))
    val out = new scala.collection.mutable.ArrayBuffer[Long](m - w + 1)
    var j = 0
    while (j < m - w + 1) {
      val sb = starts(j)
      val eb = tokEnd(starts, n, j + w - 1)
      val v = UTF8String.fromAddress(base, off + sb, eb - sb)
      if (seen.add(v)) out += XXH64.hashUTF8String(v, 42L)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }

  private val HexDigits = "0123456789abcdef".getBytes("US-ASCII")

  /** See [[graft.functions.ShingleSetKey]]: SHA-256 (lowercase hex) over
    * the length-prefixed ':'-separated '|'-joined element stream. Null
    * elements are skipped with no separator — transform maps them to null
    * and concat_ws drops nulls — though kernel inputs never carry any. */
  def shingleSetKey(sh: ArrayData): UTF8String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val n = sh.numElements()
    var first = true
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        val s = sh.getUTF8String(i)
        if (!first) md.update('|'.toByte)
        first = false
        md.update(String.valueOf(s.numChars()).getBytes("US-ASCII"))
        md.update(':'.toByte)
        md.update(s.getByteBuffer)
      }
      i += 1
    }
    val d = md.digest()
    val hex = new Array[Byte](d.length * 2)
    var j = 0
    while (j < d.length) {
      hex(2 * j) = HexDigits((d(j) >> 4) & 0xf)
      hex(2 * j + 1) = HexDigits(d(j) & 0xf)
      j += 1
    }
    UTF8String.fromBytes(hex)
  }

  /** == `size(array_distinct(Dedup.shingles(text, w)))`: the count alone —
    * nothing materializes at all (Gopher duplicate-bigram rule,
    * repetition ratio). */
  def distinctShingleCount(text: UTF8String, w: Int): Int = {
    val starts = tokenStarts(text)
    val m = starts.length
    val n = text.numBytes
    if (m < w) return 1
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val seen = new java.util.HashSet[UTF8String](Math.max(8, (m - w + 1) * 2))
    var j = 0
    while (j < m - w + 1) {
      val sb = starts(j)
      val eb = tokEnd(starts, n, j + w - 1)
      seen.add(UTF8String.fromAddress(base, off + sb, eb - sb))
      j += 1
    }
    seen.size
  }
}

private[functions] trait ShinglerKernel extends UnaryExpression {
  def w: Int
  def fn: String
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$fn needs string, got $other")
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingler.$fn($c, $w)")
}

/** Every w-token window string (== `Dedup.shingles`). */
case class ShingleArray(child: Expression, w: Int) extends ShinglerKernel {
  override def fn: String = "shingleArray"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Shingler.shingleArray(input.asInstanceOf[UTF8String], w)
  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

/** Positional per-window xxhash64 (== `transform(shingles, xxhash64)`). */
case class ShingleHashes(child: Expression, w: Int) extends ShinglerKernel {
  override def fn: String = "shingleHashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Shingler.shingleHashes(input.asInstanceOf[UTF8String], w)
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Distinct window strings (== `array_distinct(shingles)`). */
case class DistinctShingles(child: Expression, w: Int) extends ShinglerKernel {
  override def fn: String = "distinctShingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Shingler.distinctShingles(input.asInstanceOf[UTF8String], w)
  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)
}

/** Per-distinct-window xxhash64 (== `transform(array_distinct(shingles),
  * xxhash64)`). */
case class DistinctShingleHashes(child: Expression, w: Int) extends ShinglerKernel {
  override def fn: String = "distinctShingleHashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Shingler.distinctShingleHashes(input.asInstanceOf[UTF8String], w)
  override protected def withNewChildInternal(newChild: Expression): DistinctShingleHashes =
    copy(child = newChild)
}

/** Injective group key of a shingle-set array (opt-r15) — bit-identical to
  * `sha2(concat_ws("|", transform(sh, x => concat(length(x), ":", x))), 256)`
  * (Dedup.shingleSetKey's dataflow form): each element length-prefixed by
  * its CHARACTER count in decimal, ':'-separated, '|'-joined, SHA-256,
  * lowercase hex. The HOF form ran interpreted and allocated a
  * length-prefixed copy of every shingle plus the full joined string per
  * doc; this streams the same bytes through one MessageDigest. */
case class ShingleSetKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"shingle_set_key needs array<string>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Shingler.shingleSetKey(input.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingler.shingleSetKey($c)")
  override protected def withNewChildInternal(newChild: Expression): ShingleSetKey =
    copy(child = newChild)
}

/** Distinct-window count (== `size(array_distinct(shingles))`). */
case class DistinctShingleCount(child: Expression, w: Int) extends ShinglerKernel {
  override def fn: String = "distinctShingleCount"
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    Shingler.distinctShingleCount(input.asInstanceOf[UTF8String], w)
  override protected def withNewChildInternal(newChild: Expression): DistinctShingleCount =
    copy(child = newChild)
}
