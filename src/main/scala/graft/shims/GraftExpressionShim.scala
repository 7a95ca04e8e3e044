package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API: `ExpressionUtils` is `private[sql]` in Spark 4, so the
  * Column⇄Expression conversion lives in this one-file shim inside the
  * `org.apache.spark.sql` package (the standard extension-library
  * pattern).
  */
object GraftExpressionShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
