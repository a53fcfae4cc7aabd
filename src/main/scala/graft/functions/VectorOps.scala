package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-vector transforms as single codegen passes.
  *
  * The higher-order forms these replace are CodegenFallback: every element
  * costs an interpreted lambda dispatch, and a literal-array `element_at`
  * inside the lambda re-evaluates the WHOLE CreateArray per access —
  * measured ~200 µs/row on 64-dim vectors (3.7–4.1 s for a 20k-row scan at
  * sf1: `simsearch_quant`, `embedding_abtt`, `rank_fusion_rrf`), vs ~0.2 µs
  * for these loops. Arithmetic is per-element IEEE double, identical
  * operation order to the HOF forms, so outputs are bit-identical (pinned
  * in FunctionsSpec) and the DuckDB oracles are untouched.
  *
  * Null-element contract: fixture embeddings carry no null elements (the
  * [[VectorDot]] family's standing contract); a null element contributes a
  * 0.0 output slot here (primitive output arrays cannot hold nulls), which
  * downstream dot/norm math treats exactly like VectorDot's skip-null SUM
  * semantics.
  */
object VectorOps {

  /** Symmetric max-abs int8 quantization: scale = max|v|/127,
    * out_i = floor(v_i / scale + 0.5); an all-zero (or empty) vector maps
    * to zeros. Same double-op order as the HOF form
    * `transform(v, x => floor(x / (ma/127) + 0.5))`. */
  def quantize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var ma = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val a = math.abs(v.getDouble(i))
        if (a > ma) ma = a
      }
      i += 1
    }
    if (ma != 0.0) {
      val s = ma / 127.0d
      i = 0
      while (i < n) {
        if (!v.isNullAt(i)) out(i) = math.floor(v.getDouble(i) / s + 0.5d)
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ABTT per-row transform: out_i = v_i − mu_i − pc_i·d (center on the
    * corpus mean, deflect the top principal direction scaled by the row's
    * precomputed projection d = pcᵀ(v−μ)). Output length is
    * min(|v|, |mu|, |pc|) — equal by the caller's dims contract. */
  def centerDeflect(v: ArrayData, d: Double, mu: Array[Double],
      pc: Array[Double]): ArrayData = {
    val n = math.min(v.numElements(), math.min(mu.length, pc.length))
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) out(i) = v.getDouble(i) - mu(i) - pc(i) * d
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `quantize(v)` — see [[VectorOps.quantize]]. */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"int8_quantize needs array<double>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    VectorOps.quantize(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.quantize($c)")

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/** `centerDeflect(v, d)` against the plan-constant (mu, pc) pair — see
  * [[VectorOps.centerDeflect]]. The constants are IndexedSeq so plan
  * equality/canonicalization compares them by VALUE (an Array field would
  * compare by reference and defeat subexpression elimination). */
case class CenterDeflect(v: Expression, d: Expression,
    mu: IndexedSeq[Double], pc: IndexedSeq[Double]) extends BinaryExpression {

  override def left: Expression = v
  override def right: Expression = d

  @transient private lazy val muArr: Array[Double] = mu.toArray
  @transient private lazy val pcArr: Array[Double] = pc.toArray

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (v.dataType, d.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"center_deflect needs (array<double>, double), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.centerDeflect(a.asInstanceOf[ArrayData],
      b.asInstanceOf[java.lang.Double], muArr, pcArr)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val muRef = ctx.addReferenceObj("cdMu", muArr, "double[]")
    val pcRef = ctx.addReferenceObj("cdPc", pcArr, "double[]")
    nullSafeCodeGen(ctx, ev, (vv, dd) =>
      s"${ev.value} = graft.functions.VectorOps.centerDeflect($vv, $dd, $muRef, $pcRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CenterDeflect =
    copy(v = newLeft, d = newRight)
}
