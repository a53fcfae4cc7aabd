package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sign-bit binarization of a double vector into one 64-bit code: bit `i`
  * is set iff element `i` is non-null and ≥ 0.0 (−0.0 counts as ≥ 0, like
  * the SQL comparison it mirrors). Only the first 64 dimensions
  * participate — the fixture embeddings are exactly 64-dim, and a wider
  * vector would need an `array<long>` code (documented contract, not a
  * silent wrap).
  *
  * NaN yields a ZERO bit (Java's `NaN >= 0.0` is false); DuckDB's float
  * total order ranks NaN above everything, so its `v[i] >= 0` would set
  * the bit — the engines DISAGREE on NaN elements. Out of contract today
  * (embedding_qa_report screens non-finite rows before any vector reaches
  * this kernel), recorded so a future fixture with NaNs fails the
  * simsearch_hamming oracle loudly for the right reason rather than
  * looking like a packing bug.
  *
  * Why a native expression: binarization runs once per corpus vector on
  * the retrieval hot path (simsearch_hamming's candidate stage), and the
  * HOF formulation `aggregate(transform(sequence(...)))` is interpreted —
  * per-element lambda dispatch + boxing, the measured ~100× tax VectorDot
  * exists to avoid. This loop stays inside whole-stage codegen, so the
  * candidate stage is one fused scan: pack → XOR → popcount → TakeOrdered.
  *
  * Codegen discipline (the r9 VectorDot lesson): the template never
  * references `ev.isNull` — for a non-nullable child, nullSafeCodeGen
  * swaps it to FalseLiteral without declaring the captured variable and
  * the projection would silently fall back to interpreted eval. Gated in
  * CodegenGateSpec over nullable AND non-nullable children.
  */
case class SignPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"sign_pack needs array<double>, got $other")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), 64)
    var code = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && x.getDouble(i) >= 0.0) code |= (1L << i)
      i += 1
    }
    code
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val code = ctx.freshName("code")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), 64);
         |long $code = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $a.getDouble($i) >= 0.0d) { $code |= (1L << $i); }
         |}
         |${ev.value} = $code;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
}
