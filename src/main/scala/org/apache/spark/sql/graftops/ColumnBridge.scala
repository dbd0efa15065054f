package org.apache.spark.sql.graftops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column`s and catalyst `Expression`s.
  *
  * Spark 4 made the Column<->Expression converters `private[sql]`
  * (`classic.ExpressionUtils`); third-party expression libraries
  * conventionally expose them through a shim in the `org.apache.spark.sql`
  * package tree. This is the only place graft reaches into Spark
  * internals, and only for these two one-liners.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
