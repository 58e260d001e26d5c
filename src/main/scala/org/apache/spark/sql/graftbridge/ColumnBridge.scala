package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Expression bridge. Spark 4 made the classic converters
 * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
 * custom Catalyst expressions need this one-file package escape hatch —
 * the same pattern third-party Spark extensions use.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
