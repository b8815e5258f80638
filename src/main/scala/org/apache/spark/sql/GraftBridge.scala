package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression conversion (Spark 4 moved the
  * public `Column(expr)` constructor behind `classic.ExpressionUtils`).
  * Lives in the spark.sql package solely to satisfy the access modifier.
  */
object GraftBridge {
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
