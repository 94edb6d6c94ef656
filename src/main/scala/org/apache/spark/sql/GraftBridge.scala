package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the private[sql] Column↔Expression converters, so
  * graft's custom Catalyst expressions (e.g. ArrayDotProduct) can be used
  * from the public Column API. This is the standard extension seam for
  * libraries shipping native expressions on Spark 4.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
