package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling for data-quality audits: one output row per
  * column with row/null/distinct counts and min/max rendered as
  * strings (the profiler's common-type convention).
  *
  * Shape: a single wide aggregation computes every per-column
  * statistic in one pass over the table, then one generated row per
  * column is exploded from the collected struct — no per-column
  * re-scan. Exact multi-column COUNT(DISTINCT) expands rows by the
  * column count before the shuffle; at extreme scale swap in
  * approx_count_distinct per column (HLL) — the exact form is kept
  * here because the correctness oracle needs exact values.
  */
object Profiler {

  def profile(df: DataFrame): DataFrame =
    profileWith(df, c => countDistinct(col(c)))

  /** The 100-TB form of [[profile]]: distinct counts via
    * `approx_count_distinct` (HyperLogLog++, relative error `rsd`).
    * Exact multi-column COUNT(DISTINCT) expands every row once per
    * profiled column before the shuffle — a columns× blow-up of 100 TB
    * — while the HLL sketch is a fixed few-KB buffer per column
    * merged map-side, so the whole profile stays one narrow pass no
    * matter the cardinality. Same output schema as [[profile]];
    * n_distinct carries the documented ±rsd error.
    */
  def approxProfile(df: DataFrame, rsd: Double = 0.05): DataFrame =
    profileWith(df, c => approx_count_distinct(col(c), rsd))

  private def profileWith(df: DataFrame,
      distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        distinctAgg(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val total = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value"))
    }
    total.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Exact interpolated percentiles for numeric columns, one output
    * row per column — the distribution half of the audit
    * (min/max/null above tell you nothing about shape). Same
    * one-pass-then-explode pattern as `profile`.
    *
    * Scale note: exact `percentile` buffers each column's values
    * per-partition (memory ∝ distinct values) — fine to tens of
    * millions of rows per executor; at 100 TB swap in
    * `approx_percentile(c, p, accuracy)` (KLL-sketch bound memory,
    * bounded rank error). The exact form is kept because the
    * correctness oracle needs exact values (Spark's interpolation
    * matches DuckDB's quantile_cont bit-for-bit: index p·(n−1),
    * linear interpolation in doubles).
    */
  def numericPercentiles(df: DataFrame, cols: Seq[String],
      ps: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    def tag(p: Double): String = "p" + (p * 100).round.toString
    // ONE percentile(col, array(ps)) per column — a per-(col, p)
    // call would buffer and sort the column once per requested
    // percentile; the array form buffers and sorts it once total
    val aggs = cols.map { c =>
      percentile(col(c), array(ps.map(lit): _*)).as(s"__ps_$c")
    }
    val total = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name") +:
        ps.zipWithIndex.map { case (p, i) =>
          col(s"__ps_$c").getItem(i).as(tag(p))
        }: _*)
    }
    total.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** The 100-TB form of [[numericPercentiles]]:
    * `approx_percentile` (a rank-error-bounded quantile sketch).
    * Exact `percentile` buffers every value of every profiled column
    * per partition; the sketch is a bounded buffer of ~`accuracy`
    * entries per column regardless of row count, merged map-side.
    * Guarantee is on RANK (within 1/accuracy of the requested
    * quantile position), not value — the right contract for audit
    * dashboards; keep the exact form where values feed decisions.
    */
  def approxNumericPercentiles(df: DataFrame, cols: Seq[String],
      ps: Seq[Double] = Seq(0.5, 0.95), accuracy: Int = 10000): DataFrame = {
    def tag(p: Double): String = "p" + (p * 100).round.toString
    val aggs = cols.map { c =>
      percentile_approx(col(c), array(ps.map(lit): _*), lit(accuracy))
        .as(s"__ps_$c")
    }
    val total = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name") +:
        ps.zipWithIndex.map { case (p, i) =>
          col(s"__ps_$c").getItem(i).cast("double").as(tag(p))
        }: _*)
    }
    total.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
