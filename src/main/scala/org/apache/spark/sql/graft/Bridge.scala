package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge.
  *
  * `org.apache.spark.sql.classic.ExpressionUtils` is `private[sql]` in
  * Spark 4, so third-party Catalyst expressions need this one-file shim in
  * an `org.apache.spark.sql` subpackage to wrap/unwrap `Column`s. This is
  * the only file outside the `graft` package.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a custom Catalyst expression under a SQL function name for
    * the session (so `spark.sql` text can call it). `sessionState` is
    * `private[sql]`, hence this lives in the bridge. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
