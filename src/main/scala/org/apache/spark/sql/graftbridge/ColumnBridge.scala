package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column <-> catalyst Expression
  * conversions (org.apache.spark.sql.classic.ExpressionUtils). Custom
  * native expressions (graft.functions.*) need to surface as `Column`s
  * for the DataFrame API; Spark 4 removed the public
  * `Column(expr: Expression)` constructor, and the sanctioned
  * replacement lives behind `private[sql]`. This is the whole surface
  * we borrow — two one-line forwarders.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
