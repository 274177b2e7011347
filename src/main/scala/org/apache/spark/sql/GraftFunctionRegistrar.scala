package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Temp-function registration for graft's native expressions on an
  * existing session — `SparkSession.sessionState` and the function
  * registry are `private[sql]` in Spark 4, hence this shim lives in
  * the `org.apache.spark.sql` package (same pattern as
  * GraftColumnBridge). Production deployments preferring
  * configuration wire `graft.app.GraftExtensions` via
  * `spark.sql.extensions` instead.
  */
object GraftFunctionRegistrar {
  def register(spark: SparkSession,
      fns: Seq[(String, Seq[Expression] => Expression)]): Unit = {
    val registry = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
