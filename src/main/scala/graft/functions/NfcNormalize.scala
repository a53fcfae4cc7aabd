package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (java.text.Normalizer) as a native codegen
  * expression — the canonical-composition pass every multilingual corpus
  * needs before exact dedup or tokenization: a decomposed "é" (e +
  * U+0301) and the precomposed U+00E9 are byte-different (so they defeat
  * sha2 dedup keys and split token types) but NFC-equal.
  *
  * The DuckDB oracle twin is `nfc_normalize(...)`; python's
  * `unicodedata.normalize('NFC', ...)` is the third-engine form — all
  * three bind the same Unicode normalization algorithm (UAX #15), so
  * results are byte-identical across engines.
  *
  * Codegen discipline: the generated code is a plain static-call chain
  * (UTF8String → String → Normalizer → UTF8String) with no `ev.isNull`
  * reference — safe for non-nullable children (the r9 VectorDot lesson);
  * gated in CodegenGateSpec over both nullabilities.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"nfc_normalize needs string, got $other")
  }

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($a.toString(),
         |    java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
