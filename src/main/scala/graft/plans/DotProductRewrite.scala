package graft.plans

import graft.functions.ArrayDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[graft.functions.ArrayDot]] expression. Catalyst
  * evaluates higher-order-function lambdas interpreted — one closure call
  * per element per row — which makes the naive formulation ~70× slower in
  * vector-heavy plans; a user who writes the idiomatic HOF form gets the
  * native loop without knowing `array_dot` exists.
  *
  * Semantics guard: ArrayDot folds left-to-right exactly like the HOF
  * chain, but reads NULL elements as 0.0 where the HOF chain yields NULL —
  * so the rewrite only fires when both array types carry
  * `containsNull = false` (the planner-proven case). Lambda bodies must be
  * the canonical `x * y` / `acc + v` over the lambda's own variables, and
  * the aggregate's finish lambda must be the identity.
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule` — the
  * public, version-stable extension surface (same mechanism as the
  * `array_dot` function registration).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def nonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  private def isIdentity(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
              Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
            Seq(bacc: NamedLambdaVariable, bv: NamedLambdaVariable), _),
          finish: LambdaFunction)
        if zero == 0.0 &&
          x.exprId == ax.exprId && y.exprId == ay.exprId &&
          acc.exprId == bacc.exprId && v.exprId == bv.exprId &&
          isIdentity(finish) &&
          nonNullDoubleArray(l) && nonNullDoubleArray(r) =>
      ArrayDot(l, r)
  }
}
