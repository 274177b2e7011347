package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Median/MAD robust outlier detection per group — the
  * heavy-tail-safe alternative to z-scores for corpus length/quality
  * distributions (one 10^8-char document moves a mean and stddev;
  * it cannot move a median). Flags rows whose absolute deviation
  * from the group median exceeds `k` times the group's median
  * absolute deviation (MAD).
  *
  * Exactness and determinism: both medians are the LOWER median —
  * the element at rank `(n+1) div 2` in (value, id) order — so every
  * statistic is an exact element of the data (integers in, integers
  * out), and the flag is an exact integer comparison: bit-identical
  * in any engine, no interpolation.
  *
  * Scale shape: two ranked passes, each ONE hash-shuffle window
  * partitioned by the group key (never a global window), with the
  * group-sized (grp, median) frames joined back broadcast-sized.
  * Groups parallelize freely; a single pathologically hot group
  * bounds a task at that group's size — the same contract as every
  * exact per-group rank here (QuantileNorm, SCD) — swap in
  * approx_percentile when a group alone outgrows an executor.
  */
object RobustStats {

  /** (id, grp, v, med, mad, dev, outlier) per row: `med`/`mad` the
    * group's lower medians, `dev = |v − med|`, outlier 1 where
    * `dev > k · mad`.
    */
  def madOutliers(df: DataFrame, idCol: Column, groupCol: Column,
      valueCol: Column, k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val base = df.select(idCol.as("id"), groupCol.as("grp"),
      valueCol.cast("long").as("v"))
    val med = lowerMedian(base, col("v"), "med")
    val withMed = base.join(med, Seq("grp"))
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = lowerMedian(withMed, col("dev"), "mad")
    withMed.join(mad, Seq("grp"))
      .withColumn("outlier", (col("dev") > col("mad") * k).cast("int"))
      .select(col("id"), col("grp"), col("v"), col("med"), col("mad"),
        col("dev"), col("outlier"))
  }

  /** Per-group lower median of `valueCol` (ties to the smaller id):
    * the element at rank `(n+1) div 2`. Returns (grp, outName).
    */
  private def lowerMedian(df: DataFrame, valueCol: Column,
      outName: String): DataFrame = {
    val byGrp = Window.partitionBy(col("grp"))
    df.withColumn("__r",
        row_number().over(byGrp.orderBy(valueCol, col("id"))))
      .withColumn("__n", count(lit(1)).over(byGrp))
      .filter(col("__r") === expr("(__n + 1) div 2"))
      .select(col("grp"), valueCol.as(outName))
  }
}
