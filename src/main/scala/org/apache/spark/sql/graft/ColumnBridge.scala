package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 routes `Column` through ColumnNode (SPARK-44444
  * Spark-Connect unification), so wrapping a raw `Expression` needs the
  * `classic` converter; this one-file subpackage keeps that single
  * `private[sql]` touchpoint out of the engine code. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
