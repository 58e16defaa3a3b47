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

  /** Release the block-manager storage behind a `localCheckpoint`ed frame
    * (or a projection over one). `Dataset.unpersist()` CANNOT do this: it
    * routes through the CacheManager, and checkpoint blocks are pinned on
    * the materialized RDD itself, not registered as a cached query — so
    * an iterative loop that re-checkpoints per round would otherwise
    * accumulate one generation of blocks per round until driver GC +
    * ContextCleaner happen to run. Call ONLY on a superseded generation
    * whose successor checkpoint has already materialized (eager=true):
    * local-checkpoint blocks are the data — unpersisting a frame someone
    * still needs loses it, lineage is truncated.
    *
    * Deliberately conservative: acts only when the frame's plan has
    * EXACTLY one leaf and that leaf is a LogicalRDD — i.e. the frame IS a
    * checkpoint or a pure projection/filter over one. A multi-leaf plan
    * (a join whose inputs happen to include someone else's checkpoint)
    * is left alone, so a misplaced call can never free blocks a sibling
    * computation still needs. */
  def freeCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves() match {
      case scala.collection.immutable.Seq(l: org.apache.spark.sql.execution.LogicalRDD) =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
