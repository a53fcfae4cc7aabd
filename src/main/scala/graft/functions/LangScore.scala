package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence-count language scoring kernel (opt-r15). The dataflow form —
  * `Σ_p cast((length(text) − length(replace(text, p, ''))) / len(p) as int)`
  * — is codegen'd but allocates a full REPLACED COPY of the text per
  * profile pattern (5 languages × 5 patterns = 25 text copies per row) just
  * to diff the lengths. This kernel counts the same non-overlapping
  * left-to-right occurrences with `UTF8String.find` — zero allocation —
  * and replays the identical arithmetic (char-delta = count · numChars(p),
  * double-divided by the Java length and truncated) so the score is
  * bit-identical, Java-vs-codepoint length edge cases included. */
object LangScore {

  /** Non-overlapping left-to-right occurrence count — exactly the number
    * of removals `UTF8String.replace(p, "")` performs. */
  private def countOcc(text: UTF8String, p: UTF8String): Int = {
    if (p.numBytes() == 0) return 0 // replace("", …) is a no-op
    var n = 0
    var pos = text.find(p, 0)
    while (pos >= 0) {
      n += 1
      pos = text.find(p, pos + p.numBytes())
    }
    n
  }

  def score(text: UTF8String, pats: Array[UTF8String], numChars: Array[Int],
      javaLens: Array[Int]): Int = {
    var s = 0
    var i = 0
    while (i < pats.length) {
      val delta = countOcc(text, pats(i)) * numChars(i)
      s += (delta.toDouble / javaLens(i)).toInt
      i += 1
    }
    s
  }
}

/** Per-language occurrence score (== the replace-length-delta sum). */
case class LangOccurrenceScore(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"lang_occurrence_score needs string, got $other")
  }

  @transient private lazy val pats: Array[UTF8String] =
    patterns.map(UTF8String.fromString).toArray
  @transient private lazy val numChars: Array[Int] = pats.map(_.numChars())
  @transient private lazy val javaLens: Array[Int] = patterns.map(_.length).toArray

  override def nullSafeEval(input: Any): Any =
    LangScore.score(input.asInstanceOf[UTF8String], pats, numChars, javaLens)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("pats", pats, "org.apache.spark.unsafe.types.UTF8String[]")
    val nc = ctx.addReferenceObj("numChars", numChars, "int[]")
    val jl = ctx.addReferenceObj("javaLens", javaLens, "int[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.LangScore.score($c, $p, $nc, $jl)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangOccurrenceScore =
    copy(child = newChild)
}
