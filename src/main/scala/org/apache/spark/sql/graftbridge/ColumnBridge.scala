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
}
