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

  /** Recursive ColumnNode → catalyst conversion. `expression` wraps
    * the whole node tree in a lazily-converted `ColumnNodeExpression`
    * — fine inside Dataset operations (the session converter unwraps
    * it during analysis) but OPAQUE when the expression is injected
    * straight into a SQL plan via the function registry, where it
    * survives to codegen unevaluable. This converts eagerly, so
    * builder-composed Columns (e.g. the graft_canonical_url /
    * graft_gopher SQL faces) become ordinary catalyst trees the
    * analyzer resolves like any parsed SQL.
    */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
