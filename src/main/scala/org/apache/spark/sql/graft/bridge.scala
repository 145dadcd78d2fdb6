package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge between raw Catalyst Expressions and the public Column API.
  *
  * Spark 4 routes Column through ColumnNode; `ExpressionUtils.column` is the
  * supported classic-API conversion but is `private[sql]`, so this one-file
  * shim lives under `org.apache.spark.sql`. No Spark internals are modified.
  */
object bridge {
  def exprColumn(e: Expression): Column = ExpressionUtils.column(e)
  def columnExpr(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on a live session's FunctionRegistry
    * (`sessionState` is private[sql]) — the post-build path of
    * graft.plans.GraftExtensions.
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       id: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)

  /** Eagerly localCheckpoint `df` and rebuild it as a bare LogicalRDD with
    * NO inherited statistics. `Dataset.localCheckpoint` snapshots the source
    * plan's estimated stats into the checkpoint; in an iterative loop whose
    * body joins the previous checkpoint, the size-in-bytes estimate (a
    * product over join children) then COMPOUNDS across iterations into a
    * 2^k-bit BigInteger and Catalyst stats visitors start spending seconds
    * in BigInteger.multiply. Dropping the carried stats resets each
    * iteration to the default estimate — constant-size arithmetic.
    */
  /** Drain the listener bus (private[spark]) so QueryExecutionListener
    * callbacks registered by a benchmark/guard have all fired before the
    * caller inspects what they collected.
    */
  def waitForListeners(spark: org.apache.spark.sql.SparkSession,
                       timeoutMillis: Long = 30000): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis)

  def checkpointWithoutStats(df: DataFrame): DataFrame = {
    val ckpt = df.localCheckpoint()
    val spark = ckpt.sparkSession.asInstanceOf[SparkSession]
    ckpt.queryExecution.optimizedPlan match {
      // rebuild the checkpoint's own LogicalRDD minus the inherited stats,
      // KEEPING its partitioning/ordering so downstream windows and joins
      // keyed the same way skip their exchanges
      case lr: LogicalRDD =>
        Dataset.ofRows(spark, LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, lr.isStreaming, lr.stream)(spark, None, None))
      case _ =>
        val qe = ckpt.queryExecution
        Dataset.ofRows(spark, LogicalRDD(qe.analyzed.output, qe.toRdd)(spark))
    }
  }
}
