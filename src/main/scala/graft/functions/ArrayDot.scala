package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product of two ARRAY<DOUBLE> columns.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, x) => acc + x)`
  * over equal-length arrays with non-null elements: the sum is folded
  * left-to-right in element order, so IEEE-754 results are bit-identical to
  * the higher-order-function formulation (and to DuckDB's `list_sum` over
  * the zipped products) — the cross-engine oracle keeps hash-matching.
  *
  * The point is the execution tier: Catalyst evaluates higher-order-function
  * lambdas interpreted, one closure call per element per row, which made the
  * all-pairs cosine stage (|pairs| × dim lambda invocations) the hottest
  * operator in the whole bench. This expression participates in whole-stage
  * codegen as a tight primitive loop — no allocation, no virtual calls.
  *
  * Length mismatch takes the common prefix (our embedding columns are
  * fixed-dimension, so this never fires); null array → null; null *elements*
  * are read as 0.0 (embeddings are non-null by contract).
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def isArrDouble(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (isArrDouble(left.dataType) && isArrDouble(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"array_dot requires ARRAY<DOUBLE> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_s = 0.0;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  ${ev.value}_s += $a.getDouble(${ev.value}_i) * $b.getDouble(${ev.value}_i);
         |}
         |${ev.value} = ${ev.value}_s;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_dot"
}
