package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters that Spark 4
  * hid behind the connect-unified Column API. Public Spark API offers no
  * supported way to wrap a custom Catalyst Expression as a Column in 4.x
  * classic, so extensions conventionally bridge through this package. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
