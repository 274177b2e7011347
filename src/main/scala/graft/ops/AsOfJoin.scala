package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — an operator Spark lacks natively,
  * composed from built-ins the scalable way (SURVEY §2.4 note):
  * tag-union both sides, ONE window pass per key carrying the last
  * right-side payload forward, filter back to left rows.
  *
  * Cost shape: one hash-shuffle on the key + one sorted window scan
  * — identical to a sort-merge join's exchange. No per-row
  * subqueries, no range cross-product, no broadcast requirement;
  * AQE skew handling applies to the single exchange. This is the
  * standard formulation for event-to-latest-dimension alignment at
  * 100 TB (point-in-time correctness for feature stores, trade/quote
  * matching).
  */
object AsOfJoin {

  /** For each left row, attach the latest right row whose
    * `rightTime` <= `leftTime` within the same key; right columns
    * are null when no such row exists (left-outer semantics).
    *
    * At equal timestamps the right row is considered visible
    * (inclusive bound): right rows order before left rows within a
    * timestamp. `rightTieBreak` orders right rows sharing the same
    * (key, time) — the LAST one under that ordering wins; pass the
    * natural version column, or pre-deduplicate the right side.
    */
  def backward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val overlap = left.columns.toSet
      .intersect(right.columns.toSet - rightKey)
    require(overlap.isEmpty,
      s"as-of join would emit ambiguous duplicate columns: " +
        s"${overlap.mkString(", ")} — rename or drop them on one side")
    val leftStruct = struct(left.columns.map(col): _*)
    val rightStruct = struct(right.columns.map(col): _*)
    val rightType = StructType(right.schema.fields)
    val leftType = StructType(left.schema.fields)

    val l = left.select(
      col(leftKey).as("__k"),
      col(leftTime).cast("timestamp").as("__t"),
      lit(1).as("__side"),
      leftStruct.as("__l"),
      lit(null).cast(rightType).as("__r"))
    val r = right.select(
      col(rightKey).as("__k"),
      col(rightTime).cast("timestamp").as("__t"),
      lit(0).as("__side"),
      lit(null).cast(leftType).as("__l"),
      rightStruct.as("__r"))

    val ordering: Seq[Column] =
      col("__t") +: col("__side") +: rightTieBreak.map(c => col("__r").getField(c))
    val w = Window.partitionBy("__k").orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))
    val rightCols = right.columns.filterNot(_ == rightKey)
      .map(c => col("__match").getField(c).as(c))
    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols ++ rightCols: _*)
  }
}
