package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between custom Catalyst Expressions and the public Column API.
  * Spark 4 made `Column(expr)` construction private[sql]
  * (classic.ExpressionUtils); this shim lives in the sql package to expose
  * exactly the two conversions the graft engine's native expressions need.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
