package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression lift for graft's custom Catalyst expressions.
  *
  * Spark 4 hides `Column(expr)` behind `private[sql] ExpressionUtils`; this
  * subpackage of org.apache.spark.sql re-exposes exactly the two conversions
  * a library defining native expressions needs. No Spark internals are
  * modified.
  */
package object graftglue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
