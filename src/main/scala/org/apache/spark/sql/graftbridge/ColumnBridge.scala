package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters —
  * the sanctioned pattern for libraries that ship custom Catalyst
  * expressions (Spark 4 routes the public Column API through ColumnNodes,
  * so lifting a raw `Expression` needs these two calls). Nothing else in
  * this package: keep the sql-package surface minimal. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
