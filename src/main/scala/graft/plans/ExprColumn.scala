package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.GraftColumnBridge

/** Spark 4 bridge between custom Catalyst [[Expression]]s and the public
  * [[Column]] API (Column wraps a ColumnNode since 4.0; the classic
  * converter lives in org.apache.spark.sql.classic).
  */
object ExprColumn {
  def apply(e: Expression): Column = GraftColumnBridge.column(e)
  def exprOf(c: Column): Expression = GraftColumnBridge.expression(c)
}
