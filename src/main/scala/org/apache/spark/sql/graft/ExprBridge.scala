package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4's Column API no longer wraps `Expression` publicly (the
  * Connect-era split moved the converters behind `private[sql]`), so
  * libraries registering custom expressions reach them through a shim in
  * the `org.apache.spark.sql` package — the same technique Spark
  * extension projects use. Only these two converters are exposed; no
  * other internals leak out. */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
