package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column↔Expression conversions so
  * graft's custom Catalyst expressions (e.g.
  * [[graft.functions.AvroDecode]]) can surface as `Column`s. Spark 4
  * routes Column through ColumnNode; `classic.ExpressionUtils` is the
  * supported conversion but is package-private.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
