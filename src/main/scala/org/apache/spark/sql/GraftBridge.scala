package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column↔Expression conversions (Spark 4 hid the
  * `new Column(expr)` constructor behind the classic/connect split). This is
  * the supported pattern for libraries extending Catalyst: the conversion
  * itself is `org.apache.spark.sql.classic.ExpressionUtils`.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
