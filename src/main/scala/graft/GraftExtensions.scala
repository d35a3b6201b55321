package graft

import graft.functions.ArrayDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark extension point for graft's native expressions — install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`), after which `array_dot` is a
  * first-class SQL function:
  *
  * {{{ SELECT array_dot(a.e, b.e) / (a.nrm * b.nrm) AS cos FROM ... }}}
  *
  * This is the documented public mechanism for shipping custom Catalyst
  * expressions in a library (SparkSessionExtensions.injectFunction); no
  * UDF registration, full codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.arrayDotFunction)
    // HOF dot-product idiom → codegen'd ArrayDot (see DotProductRewrite)
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
  }
}

object GraftExtensions {
  val arrayDotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("array_dot"),
    new ExpressionInfo(classOf[ArrayDot].getCanonicalName, "array_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"array_dot takes 2 arguments, got ${args.length}")
      ArrayDot(args.head, args(1))
    })
}
