package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Column <-> Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4's Column API no longer wraps `Expression` publicly (the
  * Connect-era split moved the converters behind `private[sql]`), so
  * libraries registering custom expressions reach them through a shim in
  * the `org.apache.spark.sql` package — the same technique Spark
  * extension projects use. Only these converters are exposed; no
  * other internals leak out. */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Release the block-manager storage behind a `localCheckpoint(eager=true)`
    * Dataset. `Dataset.unpersist()` only talks to the cache manager, which
    * never tracked checkpoint blocks — they are persisted on the internal
    * `RDD` that the resulting `LogicalRDD` leaf wraps, and stay resident
    * until that RDD is garbage-collected. Iterative algorithms that
    * checkpoint once per round (connected components' pointer-jump loop)
    * must free each round's blocks explicitly or they accumulate for the
    * whole loop. No-op for plans without a LogicalRDD leaf. */
  def releaseLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
