// Bridge into Spark's classic Column internals: ExpressionUtils is
// private[sql], so the two one-line forwarders live in the package that
// owns it — the standard technique for Catalyst-extension libraries.
package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
