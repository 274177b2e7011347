package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge for graft's native
  * expressions. Spark 4 moved this conversion behind
  * `private[sql] classic.ExpressionUtils`; a one-object shim in the
  * `org.apache.spark.sql` package is the established pattern for
  * extension libraries that ship custom codegen expressions without
  * registering a whole SparkSessionExtensions function catalog.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
