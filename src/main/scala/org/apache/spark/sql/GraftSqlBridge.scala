package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal `private[sql]` access bridge: converting between the public
  * Column API and raw Catalyst Expressions is package-private in
  * Spark 4 (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * libraries that define native expressions conventionally expose it
  * via a shim in this package. Only used by
  * [[graft.functions.LegacyPartitionExpr]]. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
