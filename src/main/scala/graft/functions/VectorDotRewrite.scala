package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the interpreted higher-order dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
  *
  * into the codegen [[VectorDot]] expression in its `nullAsNull` mode —
  * bit-exact HOF semantics including the null cases (length mismatch or a
  * null element poisons the fold to NULL), ~100× cheaper per row. An
  * optimizer rewrite must never change results: the default skip-mode
  * VectorDot would return a partial sum where the fold returns NULL (r8
  * review finding), so this rule deliberately does NOT use it. Users who
  * write the idiomatic declarative form get the fast path transparently;
  * injected via [[GraftExtensions]] (`spark.sql.extensions`) or
  * `spark.experimental.extraOptimizations`.
  */
object VectorDotRewriteRule extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // early bail (same rationale as EpochNanosPushdownRule): only plans that
    // actually contain an aggregate() HOF can match — skip the transform
    // machinery everywhere else
    if (!plan.exists(_.expressions.exists(_.exists(_.isInstanceOf[ArrayAggregate]))))
      return plan
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(ml, mr, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fa: NamedLambdaVariable), _))
          if isDoubleArray(a) && isDoubleArray(b) &&
            // product of exactly the two zipped elements (either order)
            ((isVar(ml, x) && isVar(mr, y)) || (isVar(ml, y) && isVar(mr, x))) &&
            // merge is acc + element (either order)
            ((isVar(al, acc) && isVar(ar, el)) || (isVar(al, el) && isVar(ar, acc))) &&
            // finish is identity
            isVar(fin, fa) =>
        VectorDot(a, b, nullAsNull = true)
    }
  }
}
