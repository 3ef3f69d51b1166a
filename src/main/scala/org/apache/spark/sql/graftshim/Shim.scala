package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface needed by extension libraries:
  * Column ⇄ catalyst Expression conversion (the Spark-4 replacement for the
  * removed `new Column(expr)` constructor). Lives under org.apache.spark.sql
  * for access; the public face is graft.expressions.GraftFunctions.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
