package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 moved
  * it behind `classic.ExpressionUtils` during the Connect refactor).
  * Standard extension-package pattern: this object lives in
  * `org.apache.spark.sql` solely to re-export the two conversions graft's
  * custom expressions need.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
