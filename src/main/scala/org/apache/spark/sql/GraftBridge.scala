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

  /** Register a SQL function on an EXISTING session (the extensions path
    * only applies to sessions built with `withExtensions`/the config —
    * `getOrCreate` on a live session ignores it). */
  def registerFunction(
      spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
  }
}
