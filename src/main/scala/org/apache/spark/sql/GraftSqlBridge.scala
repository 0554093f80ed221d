package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Column <-> Catalyst Expression converters,
  * which are `private[sql]` in Spark 4's Column API. The standard
  * technique for libraries shipping custom codegen expressions (the
  * pre-4.0 `new Column(expr)` / `col.expr` surface moved behind this). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
