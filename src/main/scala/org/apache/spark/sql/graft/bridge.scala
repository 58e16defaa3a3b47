package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for `private[sql]` Column<->Expression converters — the
  * standard seam Spark extension libraries use to expose custom Catalyst
  * expressions through the public Column API. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply the function injections of an extensions module to a live
    * session's registry (test seam — production path is
    * `spark.sql.extensions` at session build time). */
  def applyFunctionExtensions(ext: org.apache.spark.sql.SparkSessionExtensions,
                              spark: org.apache.spark.sql.SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)
}
