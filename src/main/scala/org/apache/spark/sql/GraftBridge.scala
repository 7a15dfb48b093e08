package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native expressions.
  *
  * Spark 4 scopes `ExpressionUtils` (and `ExpressionColumnNode`)
  * `private[sql]`, so third-party Catalyst expressions need one accessor
  * compiled inside the `org.apache.spark.sql` package — the standard
  * pattern external Spark extensions use. This is the only file in the
  * repo outside the `graft` namespace.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
