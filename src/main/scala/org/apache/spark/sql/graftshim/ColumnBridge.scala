package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 made `Column` backend-agnostic; the classic converter
  * (`org.apache.spark.sql.classic.ExpressionUtils`) is `private[sql]`, so
  * wrapping a custom Catalyst `Expression` into a `Column` requires code
  * inside the `org.apache.spark.sql` package tree. This is the standard
  * interop shim third-party Spark libraries ship (same technique as
  * Delta/Frameless); it contains no logic of its own.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
