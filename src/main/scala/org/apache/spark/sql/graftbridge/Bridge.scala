package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal public bridge between Catalyst `Expression`s and the public
  * `Column` API. Spark 4 made the `Column(expr)` constructor internal
  * (`org.apache.spark.sql.classic.ExpressionUtils` is `private[sql]`),
  * so custom expressions need this one-hop adapter living under
  * `org.apache.spark.sql`. No Spark internals are re-implemented here.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
