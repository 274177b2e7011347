package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-sided CUSUM drift detection (Page 1954) over per-key integer
  * series — the classic "has this metric shifted upward" monitor for
  * ingest volumes and event rates (a sustained drift accumulates
  * where a single spike decays). Companion to the EWMA/anomaly ops:
  * EWMA flags point outliers, CUSUM flags sustained level shifts.
  *
  * The textbook recurrence `S_i = max(0, S_{i-1} + (x_i − k))` is
  * sequential; the distributed form uses its closed form
  * `S_i = y_i − min(0, min_{j≤i} y_j)` with `y_i = Σ_{t≤i}(x_t − k)`
  * — two running windows over the SAME key partition, no recursion,
  * no per-key collect. With integer x and integer drift target k,
  * every S is an exact integer: bit-identical in any engine.
  *
  * Scale shape: ONE hash shuffle on the key feeds all windows (the
  * per-key target, the running sum, the running min). Series length
  * per key is calendar-bounded; keys parallelize freely.
  */
object Cusum {

  /** (key, ord, v, target, s, flag) for each point of the per-key
    * series: `target` is the per-key floor mean (the drift
    * allowance k), `s` the CUSUM statistic, `flag` 1 where
    * `s > thresholdNum · target` — a sustained upward shift.
    * `tieCol` breaks equal-`ord` ties so the running windows are a
    * total order (the SCD/Markov determinism discipline); pass the
    * order column itself when it is already unique per key.
    */
  def cusumScores(df: DataFrame, keyCol: Column, orderCol: Column,
      valueCol: Column, tieCol: Column,
      thresholdNum: Int = 3): DataFrame = {
    require(thresholdNum >= 1, s"thresholdNum must be >= 1: $thresholdNum")
    val byKey = Window.partitionBy(col("key"))
    val run = byKey.orderBy(col("ord"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(keyCol.as("key"), orderCol.as("ord"), tieCol.as("__tie"),
        valueCol.cast("long").as("v"))
      .withColumn("__tot", sum(col("v")).over(byKey))
      .withColumn("__n", count(lit(1)).over(byKey))
      .withColumn("target", expr("__tot div __n"))
      .withColumn("__y", sum(col("v") - col("target")).over(run))
      .withColumn("s", col("__y") - least(lit(0L), min(col("__y")).over(run)))
      .withColumn("flag",
        (col("s") > col("target") * thresholdNum).cast("int"))
      .select(col("key"), col("ord"), col("v"), col("target"), col("s"),
        col("flag"))
  }
}
