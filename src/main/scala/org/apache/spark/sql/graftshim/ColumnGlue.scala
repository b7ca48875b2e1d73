package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst Expressions.
  *
  * Spark 4 made `Column.expr` / `new Column(expr)` internal (`private[sql]`
  * `org.apache.spark.sql.classic.ExpressionUtils`); a library that ships custom
  * Catalyst expressions needs this one-file shim inside the `org.apache.spark.sql`
  * namespace to lift them into user-facing `Column`s.
  */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
