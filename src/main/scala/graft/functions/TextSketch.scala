package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native sketch kernels for the dedup family (reference's near-dup
  * north-star). The higher-order forms — k MinHash folds
  * (`aggregate(hashes, MaxValue, least(acc, xxhash64(h, i)))` per seed) and
  * 63 SimHash bit-sum folds — are interpreted per element (lambda binding +
  * boxing): measured multi-second at sf0.1. These single-pass loops keep the
  * sketch projection inside whole-stage codegen and are bit-identical to the
  * HOF forms (same Spark xxhash64 mixing, same fold order).
  */
object TextSketch {

  /** out[i] = min over h in hashes of xxhash64(h, i) with Spark's chained
    * seeding: hashInt(i, hashLong(h, 42)) — identical to the HOF form where
    * the seed index comes from `sequence(0, k-1)` (IntegerType). */
  def minhash(hashes: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      if (!hashes.isNullAt(j)) mix(XXH64.hashLong(hashes.getLong(j), 42L), k, out)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** String-input variant: each element is hashed once with Spark's
    * `xxhash64(s)` (seed 42), then re-mixed per seed exactly like
    * [[minhash]] — so signatures equal `minhash(transform(sh, xxhash64), k)`
    * without materializing the intermediate hash array. */
  def minhashStr(shingles: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      if (!shingles.isNullAt(j)) {
        val s = shingles.getUTF8String(j)
        mix(XXH64.hashLong(XXH64.hashUTF8String(s, 42L), 42L), k, out)
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private def mix(h0: Long, k: Int, out: Array[Long]): Unit = {
    var i = 0
    while (i < k) {
      val v = XXH64.hashInt(i, h0)
      if (v < out(i)) out(i) = v
      i += 1
    }
  }

  // ------------------------------------------------------------------
  // Polynomial prime-field hashing — the SQL-reproducible family. Unlike
  // xxhash64 (Spark-internal mixing), every step below is plain modular
  // arithmetic a DuckDB oracle replays exactly (list_reduce over
  // codepoints), which upgrades the minhash/simhash dedup keys from
  // rows-only checks to full hash-compared oracles.
  // ------------------------------------------------------------------

  /** Polynomial codepoint hash: h = fold(7, h*131 + codepoint) mod 1e9+7.
    * Products stay < 2^60, so plain long arithmetic is exact under ANSI.
    * DuckDB twin: list_reduce(list_prepend(7, codepoints), (a,c) ->
    * (a*131 + c) % 1000000007).
    *
    * COLLISION BOUND: ~30-bit range ⇒ birthday collisions from ~√(1e9+7) ≈
    * 3×10⁴ distinct inputs — guaranteed present in warehouse-scale token /
    * shingle sets. This family exists for ORACLE REPLAYABILITY (DuckDB can
    * recompute it bit-for-bit); it is only used where collisions degrade an
    * approximation one-sidedly (count-min / Bloom bucketing via
    * [[graft.ext.Sketches.bucket]], minhash folds below), never as an
    * identity. The 100 TB identity/dedup paths use 64-bit xxhash64
    * ([[minhash]]/[[minhashStr]]) or 256-bit sha2 fingerprints. */
  final val PolyP = 1000000007L

  def polyHash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    var h = 7L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 131L + cp) % PolyP
      i += Character.charCount(cp)
    }
    h
  }

  /** MinHash signature over the affine family h_i(x) = (a_i·x + b_i) mod P
    * with a_i = (i+1)·2654435761 mod P, b_i = (i+1)·40503 + 17 mod P —
    * constants chosen so every intermediate fits a long.
    *
    * COLLISION BOUND at the signature layer: a [[polyHash]] collision
    * between two distinct shingles (expected once the corpus-wide shingle
    * vocabulary passes ~3×10⁴ — see [[polyHash]]) makes those shingles
    * indistinguishable to ALL k folds, which biases the estimated Jaccard
    * upward by at most the colliding shingles' weight in the union. Fine
    * for LSH candidate GENERATION (band slices of these values — a false
    * candidate is removed by the exact-Jaccard verify stage that every
    * dedup_cluster_lsh-shaped pipeline runs); for verification-free dedup
    * at 100 TB use the xxhash64 family ([[minhash]]). */
  def minhashPoly(shingles: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      if (!shingles.isNullAt(j)) {
        val h = polyHash(shingles.getUTF8String(j))
        var i = 0
        while (i < k) {
          val a = ((i + 1) * 2654435761L) % PolyP
          val b = ((i + 1) * 40503L + 17L) % PolyP
          val v = (a * h + b) % PolyP
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 61-bit token hash for SimHash: widen [[polyHash]] into the Mersenne
    * field 2^61−1 (one more affine step; product < 2^62). */
  def tokenHash61(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Long](n)
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j))
        out(j) = (polyHash(tokens.getUTF8String(j)) * 2654435761L + 986244679L) %
          2305843009213693951L
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Raw per-token [[polyHash]] values (array<string> → array<long>, each
    * < 1e9+7) — the input the count-min / Bloom affine bucket families
    * consume: with h < 2^30 every a·h + b stays < 2^60, so both engines
    * evaluate the identical exact long arithmetic. */
  def tokenHashPoly(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Long](n)
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) out(j) = polyHash(tokens.getUTF8String(j))
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Per-shingle [[polyHash]] values computed straight from the text in one
    * pass: for each w-token window, fold seed 7 over the window's token
    * characters with a single space (32) between tokens — bit-identical to
    * `polyHash(concat_ws(" ", slice(split(text, " "), j, w)))` (including
    * empty tokens from repeated spaces, which concat_ws keeps), but with no
    * shingle strings, no per-element lambda binding, and no allocations
    * beyond the output array. Short docs (< w tokens) collapse to the
    * whole-text single shingle, matching [[graft.ext.Dedup.shingles]]. */
  def shingleHashPoly(text: org.apache.spark.unsafe.types.UTF8String, w: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    // token start offsets under split(text, " ") semantics (keep empties)
    val starts = new scala.collection.mutable.ArrayBuffer[Int](16)
    starts += 0
    var i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') starts += i + 1
      i += 1
    }
    val m = starts.length //                          token count
    def tokEnd(j: Int): Int = if (j + 1 < m) starts(j + 1) - 1 else n
    def foldWindow(j0: Int, nTok: Int): Long = {
      var h = 7L
      var j = j0
      while (j < j0 + nTok) {
        if (j > j0) h = (h * 131L + 32L) % PolyP
        var p = starts(j)
        val e = tokEnd(j)
        while (p < e) {
          val cp = s.codePointAt(p)
          h = (h * 131L + cp) % PolyP
          p += Character.charCount(cp)
        }
        j += 1
      }
      h
    }
    val out =
      if (m < w) Array(foldWindow(0, m))
      else Array.tabulate(m - w + 1)(j => foldWindow(j, w))
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 63-bit SimHash: bit b of the result is set iff
    * Σ_h (bit b of h ? +1 : −1) > 0. 63 bits keeps the assembled value
    * non-negative under ANSI arithmetic (Dedup.scala contract). */
  def simhash(hashes: ArrayData): Long = {
    val counts = new Array[Int](63)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      if (!hashes.isNullAt(j)) {
        val h = hashes.getLong(j)
        var b = 0
        while (b < 63) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 63) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** MinHash signature (array<long> pre-hashed tokens OR array<string>
  * shingles → array<long> of k per-seed minima) as one codegen'd pass. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isStr = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<bigint> or array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    if (isStr) TextSketch.minhashStr(input.asInstanceOf[ArrayData], k)
    else TextSketch.minhash(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isStr) "minhashStr" else "minhash"
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketch.$fn($c, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** MinHash signature over the SQL-reproducible polynomial family
  * (array<string> shingles → array<long> of k per-seed minima). */
case class MinHashPolySig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"minhash_poly_sig needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextSketch.minhashPoly(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketch.minhashPoly($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashPolySig =
    copy(child = newChild)
}

/** Per-token 61-bit polynomial hash (array<string> → array<long>),
  * the SQL-reproducible SimHash input. */
case class TokenHash61(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"token_hash61 needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextSketch.tokenHash61(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketch.tokenHash61($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHash61 =
    copy(child = newChild)
}

/** SimHash signature (array<long> token hashes → 63-bit long) as one
  * codegen'd pass. */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"simhash_sig needs array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextSketch.simhash(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketch.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

/** Raw per-token polynomial hashes (array<string> → array<long> mod 1e9+7)
  * — codegen'd input stage for the count-min / Bloom bucket families. */
case class TokenHashPoly(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"token_hash_poly needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextSketch.tokenHashPoly(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketch.tokenHashPoly($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHashPoly =
    copy(child = newChild)
}

/** One-pass per-shingle polynomial hashes (string → array<long>): the
  * codegen replacement for shingles() + TokenHashPoly when only the hash
  * values are consumed (span duplication, CDC boundaries). */
case class ShingleHashPoly(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"shingle_hash_poly needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextSketch.shingleHashPoly(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSketch.shingleHashPoly($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashPoly =
    copy(child = newChild)
}
