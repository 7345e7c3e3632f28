package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 made the Column constructor ColumnNode-based and scoped the
  * catalyst converters `private[sql]`; third-party expression libraries
  * bridge from inside the package namespace (the pattern used by public
  * Spark extension projects, e.g. Qbeast's DatasetFactory).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
