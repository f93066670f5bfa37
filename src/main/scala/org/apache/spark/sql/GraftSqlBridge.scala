package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Catalyst Expression bridge for graft's native expressions.
  *
  * Spark 4's public `Column` no longer exposes the underlying Expression
  * (it is backed by a ColumnNode for Connect compatibility) and the classic
  * converters are `private[sql]`, so — like other Spark extension libraries
  * (connectors, UDF packages) — we host this one-file bridge inside the
  * `org.apache.spark.sql` package. Nothing else in graft lives here.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
