package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ↔ Expression bridge. Spark 4's Connect refactor made
 * `Column.expr` / `ExpressionUtils` private[sql]; this shim (inside the
 * `org.apache.spark.sql` namespace, the standard extension-library
 * technique) re-exposes the two conversions our custom Catalyst
 * expressions need. No Spark internals are modified.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
