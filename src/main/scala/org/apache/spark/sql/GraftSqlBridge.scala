package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Column <-> Catalyst Expression converters,
  * which are `private[sql]` in Spark 4's Column API. The standard
  * technique for libraries shipping custom codegen expressions (the
  * pre-4.0 `new Column(expr)` / `col.expr` surface moved behind this). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager ColumnNode -> Catalyst conversion. `expression` wraps the
    * node lazily (resolved only at Dataset boundaries), which is
    * Unevaluable if embedded directly in an analyzed plan — function-
    * registry builders (SparkSessionExtensions.injectFunction) must
    * return a real Catalyst tree, whose remaining UnresolvedFunction
    * nodes the analyzer then resolves in its fixed-point loop. */
  def resolvableExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
