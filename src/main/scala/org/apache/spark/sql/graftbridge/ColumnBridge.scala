package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ExpressionColumnNode, ExpressionUtils}

/** Bridge to Spark's `private[sql]` Column ↔ catalyst Expression
  * converters (the classic-mode ColumnNode wrappers). Lives inside the
  * `org.apache.spark.sql` package namespace solely to satisfy the
  * `private[sql]` qualifier — the one sanctioned way to plug custom
  * Catalyst expressions (graft.functions.WrapAffine) into the public
  * Column algebra without a fork.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def node(e: Expression) = ExpressionColumnNode(e)

  /** Apply a SparkSessionExtensions' injected functions to a session's
    * registry — what `getOrCreate` does when `spark.sql.extensions` is
    * set at context construction; `registerFunctions` is `private[sql]`,
    * hence bridged here (used by GraftExtensionsSpec to test the
    * extension wiring against the shared test context). */
  def registerFunctions(ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession): Unit =
    ext.registerFunctions(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry)
}
