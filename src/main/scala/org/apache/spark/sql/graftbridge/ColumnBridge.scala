package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * supported way to use a custom Catalyst `Expression` from the public
  * DataFrame API in Spark 4 (Column no longer exposes an Expression
  * constructor). Lives under `org.apache.spark.sql` for access; contains no
  * Spark code of its own. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
