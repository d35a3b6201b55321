package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd flattened self outer product of an ARRAY<DOUBLE>
  * column: for input `a` of length d, returns the d² array
  * `[a(0)·a(0), a(0)·a(1), …, a(d−1)·a(d−1)]` in row-major (i·d + j)
  * order.
  *
  * This is the per-row kernel of the covariance aggregate
  * (Pca.covariance): the higher-order-function spelling
  * `flatten(transform(a, x -> transform(a, y -> x*y)))` evaluates d²
  * interpreted lambda calls per row plus d nested array allocations —
  * the same execution-tier trap ArrayDot closed for the cosine path.
  * Here it is one tight primitive loop inside whole-stage codegen with a
  * single output allocation.
  *
  * Each product is one IEEE multiply of the same two doubles in either
  * engine, so the DuckDB twin `s.e[i] * s.e[j]` over unnested index
  * ranges is bit-identical element-wise; the downstream covariance sum
  * restores order-independence by casting every product to DECIMAL
  * before summing (the dsum discipline).
  *
  * Null array → null; null *elements* are read as 0.0 (embedding columns
  * are non-null by contract, same as ArrayDot).
  */
case class OuterProductFlat(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"outer_product_flat requires ARRAY<DOUBLE> input, got ${t.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val d = x.numElements()
    val out = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      val xi = x.getDouble(i)
      var j = 0
      while (j < d) { out(i * d + j) = xi * x.getDouble(j); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |int ${ev.value}_d = $a.numElements();
         |double[] ${ev.value}_o = new double[${ev.value}_d * ${ev.value}_d];
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_d; ${ev.value}_i++) {
         |  double ${ev.value}_xi = $a.getDouble(${ev.value}_i);
         |  for (int ${ev.value}_j = 0; ${ev.value}_j < ${ev.value}_d; ${ev.value}_j++) {
         |    ${ev.value}_o[${ev.value}_i * ${ev.value}_d + ${ev.value}_j] =
         |      ${ev.value}_xi * $a.getDouble(${ev.value}_j);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(${ev.value}_o);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "outer_product_flat"
}
