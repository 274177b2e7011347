package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-group quantile normalization: map each row's value to the
  * GLOBAL value at the same quantile its value occupies WITHIN its
  * group — the standard score-calibration step when mixing corpora
  * whose quality scores live on different scales (source A's 0.7 and
  * source B's 0.7 rarely mean the same thing; their 70th percentiles
  * do). All rank arithmetic is integer (ranks, counts, one ppm
  * division), so the mapping is bit-identical in any engine.
  *
  * Scale shape: the per-group rank and count are ONE hash-shuffle
  * window (both over the group key); the global rank comes from the
  * two-phase [[PrefixSum]] (one range shuffle — never a
  * single-partition window); the total row count N is the MAX global
  * rank — a 1-row broadcast aggregate riding the same ranked frame,
  * so the operator runs zero driver actions of its own (no separate
  * count job); the final lookup is an equi-join on the computed
  * global index. Nothing is broadcast at data size, nothing collects
  * to the driver.
  */
object QuantileNorm {

  /** Adds `norm` — the global `valueCol` at each row's within-group
    * quantile — to (id, group, value). Quantile in ppm:
    * `q = rank·10^6 div (group_count+1)`; global pick index
    * `clamp(q·(N+1) div 10^6, 1, N)` over the globally ranked values
    * (ties broken by `idCol` on both rankings).
    */
  def quantileNormalize(df: DataFrame, idCol: Column, groupCol: Column,
      valueCol: Column): DataFrame = {
    val base = df.select(idCol.as("id"), groupCol.as("grp"),
      valueCol.cast("long").as("v"))
    val byGrp = Window.partitionBy(col("grp"))
    val ranked = base
      .withColumn("r", row_number().over(byGrp.orderBy(col("v"), col("id"))))
      .withColumn("cnt", count(lit(1)).over(byGrp))
      .withColumn("q_ppm", expr("(CAST(r AS BIGINT) * 1000000) div (cnt + 1)"))
    val globalRanked = PrefixSum.withRunningTotal(
        base.select(col("v").as("gv"), col("id").as("gid")),
        Seq(col("gv"), col("gid")), lit(1L), "grank")
      .select(col("gv"), col("grank"))
    // N = max global rank: a 1-row broadcast off the ranked frame —
    // no count() job, no N-as-literal plan
    val n = globalRanked.agg(max(col("grank")).as("__n"))
    ranked
      .crossJoin(broadcast(n))
      .withColumn("pick", greatest(lit(1L),
        least(col("__n"), expr("(q_ppm * (__n + 1)) div 1000000"))))
      .join(globalRanked, col("pick") === col("grank"))
      .select(col("id"), col("grp"), col("v"), col("gv").as("norm"))
  }
}
