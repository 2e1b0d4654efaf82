package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * supported bridge (`ExpressionUtils`) is `private[sql]`. This is the one
  * file that lives inside the `org.apache.spark.sql` namespace to expose it
  * to the graft engine; everything else stays in `graft.*`. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
