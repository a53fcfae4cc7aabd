package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two double arrays as a native codegen expression.
  *
  * The higher-order equivalent `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0D, (acc,x) -> acc+x)` is interpreted (lambda binding + boxing per
  * element): measured ~48 µs per 64-dim pair; this loop is ~100× cheaper and
  * keeps similarity joins inside whole-stage codegen. Summation order is
  * ascending-index, identical to the sequential fold, so results are
  * bit-identical to the HOF form (and to the DuckDB oracle).
  *
  * Null-element contract: a position where EITHER side is a null element is
  * SKIPPED — it contributes nothing to the sum. This matches SQL aggregate
  * semantics (`x * NULL` is NULL and `SUM` skips NULL terms), i.e. the
  * DuckDB unnest-multiply-SUM oracle formulation, and the HOF form above
  * once its lambda null-propagates. Before r8 this kernel read null
  * elements as 0.0 via `getDouble` without `isNullAt` — coincidentally the
  * same sum, but by reading undefined slot bytes rather than by contract;
  * the skip is now explicit in both the interpreted and codegen paths.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"vector_dot needs two array<double>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}
