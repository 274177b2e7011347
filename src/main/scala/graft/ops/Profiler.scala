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
    * Scale note: exact `percentile` buffers each column's values in
    * its partial state and merges everything into one final reducer —
    * fine to tens of millions of rows; at 100 TB use
    * [[distributedPercentiles]] (same exact values, distributed
    * sort) or [[approxNumericPercentiles]] (bounded rank error).
    * Spark's interpolation matches DuckDB's quantile_cont
    * bit-for-bit: index p·(n−1), linear interpolation in doubles.
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

  /** EXACT percentiles at 100 TB: the `percentile` aggregate used by
    * [[numericPercentiles]] buffers every value in its partial state
    * and merges all of it into ONE final reducer — a single-node
    * sort of the whole column, the global-aggregate twin of the
    * single-partition-window trap. This form keeps exactness but
    * distributes the work: per column, a range-partitioned sort +
    * the two-phase prefix count ([[PrefixSum]]) assign each value
    * its global rank in parallel, then only the ≤ 2·|ps| rank-match
    * rows come back to the driver for the interpolation. Same
    * formula as Spark's Percentile and DuckDB's quantile_cont
    * (index p·(n−1), lower + (higher−lower)·frac) — bit-identical
    * output, verified by unit test against [[numericPercentiles]].
    */
  def distributedPercentiles(df: DataFrame, cols: Seq[String],
      ps: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    def tag(p: Double): String = "p" + (p * 100).round.toString
    val spark = df.sparkSession
    // ONE pass for every profiled column: unpivot to (col_name, v)
    // and sort the union globally by (col_name, v, uid) — each
    // column's values form a contiguous rank range, recovered from
    // per-column counts. The synthetic uid makes the order TOTAL
    // (ties are window peers and would share one collapsed rank);
    // equal values are interchangeable at any rank, so tie placement
    // never changes the selected value.
    val stacked = df
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("cn"), col(c).cast("double").as("v"))
      }: _*)).as("e"))
      .select(col("e.cn").as("__cn"), col("e.v").as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("__uid", monotonically_increasing_id())
    val ranked = PrefixSum.withRunningTotal(stacked,
      Seq(col("__cn"), col("__v"), col("__uid")), lit(1L), "__grk")
    // driver-sized: one row per column
    val counts = ranked.groupBy("__cn").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sortedCns = cols.filter(counts.contains).sorted
    val starts: Map[String, Long] = sortedCns
      .zip(sortedCns.map(counts).scanLeft(0L)(_ + _).init).toMap
    case class Target(cn: String, idx: Double, lo: Long, hi: Long)
    val targets = for {
      c <- cols if counts.contains(c)
      p <- ps
    } yield {
      val idx = p * (counts(c) - 1)
      Target(c, idx, starts(c) + math.floor(idx).toLong + 1,
        starts(c) + math.ceil(idx).toLong + 1)
    }
    val need = targets.flatMap(t => Seq(t.lo, t.hi)).distinct
    // driver-sized: ≤ 2·|cols|·|ps| rank-match rows
    val got = ranked.filter(col("__grk").isin(need: _*))
      .select("__grk", "__v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byCol = targets.groupBy(_.cn)
    val out = cols.map { c =>
      val pvals: Seq[Any] = byCol.get(c) match {
        case None => ps.map(_ => null) // all-null column
        case Some(ts) => ts.map { t =>
          val vlo = got(t.lo)
          vlo + (got(t.hi) - vlo) * (t.idx - math.floor(t.idx))
        }
      }
      org.apache.spark.sql.Row.fromSeq(c +: pvals)
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("col_name",
        org.apache.spark.sql.types.StringType, nullable = false) +:
      ps.map(p => org.apache.spark.sql.types.StructField(tag(p),
        org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava), schema)
  }

  /** The 100-TB form of [[numericPercentiles]] when bounded rank
    * error suffices: `approx_percentile` (a quantile sketch).
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

  /** Fixed-bin numeric histogram: `bins` equal-width buckets over
    * the column's observed [min, max], one row per non-empty bucket
    * with its bounds and count. Two passes by construction (the
    * bounds aggregate, then one bucket groupBy) — both full scans,
    * no row expansion, so the cost is 2× a count(*) at any scale.
    * The max lands in the last bucket (clamped), and a degenerate
    * single-value range collapses to bucket 0.
    */
  def histogram(df: DataFrame, valueCol: String, bins: Int = 20): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    val v = col(valueCol).cast("double")
    // driver-sized by construction: one row, two doubles
    val b = df.agg(min(v), max(v)).head()
    require(!b.isNullAt(0), s"histogram($valueCol): no non-null values")
    val (mn, mx) = (b.getDouble(0), b.getDouble(1))
    val width = (mx - mn) / bins
    val bucket =
      if (width == 0) lit(0)
      else least(lit(bins - 1), floor((v - lit(mn)) / lit(width)).cast("int"))
    df.filter(v.isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", lit(mn) + col("bucket") * lit(width))
      .withColumn("hi", lit(mn) + (col("bucket") + 1) * lit(width))
      .select("bucket", "lo", "hi", "n")
  }

  /** Per-group Pearson correlation, EXACT where it can be: both
    * columns are scaled to integer grids (`xScale`/`yScale` decimal
    * places — correlation is scale-invariant, so the factors
    * cancel), all five moment sums and the cross products
    * n·Σxy − Σx·Σy accumulate in decimal(38,0) (order-independent,
    * no float drift at ANY row count — 1e12 rows of 1e7-scale values
    * stay under 35 digits), and doubles appear only in the final
    * correctly-rounded divide/sqrt — so the correlations are
    * bit-identical in any engine, unlike `corr()`'s streaming float
    * moments, whose result depends on partitioning.
    *
    * One aggregate pass, one shuffle on the group key. Returns
    * (group, n, corr) with corr NULL for degenerate (zero-variance)
    * groups.
    */
  def exactCorrelation(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, xScale: Int = 2, yScale: Int = 2): DataFrame = {
    def grid(c: String, s: Int) =
      round(col(c).cast("double") * lit(math.pow(10, s))).cast("long")
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val x = grid(xCol, xScale)
    val y = grid(yCol, yScale)
    val agg = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(d(x)).as("sx"), sum(d(y)).as("sy"),
        sum(d(x) * d(y)).as("sxy"),
        sum(d(x) * d(x)).as("sxx"), sum(d(y) * d(y)).as("syy"))
    val n = d(col("n"))
    val cov = n * col("sxy") - col("sx") * col("sy")
    val vx = n * col("sxx") - col("sx") * col("sx")
    val vy = n * col("syy") - col("sy") * col("sy")
    agg.select(col(groupCol), col("n"),
      when(vx > 0 && vy > 0,
        cov.cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
        .as("corr"))
  }

  /** Winsorized per-group statistics — the robust-mean preprocessing
    * of metric pipelines: values below the `pctLo`-th / above the
    * `pctHi`-th percentile are CLIPPED to those bounds before the
    * mean, so a handful of fat-finger outliers can't drag a group
    * aggregate (Tukey's winsorization; the signal-clipping cousin of
    * [[exactCorrelation]]'s robustness concerns).
    *
    * Percentiles are DISCRETE (type-1): the bound is the smallest
    * value whose cumulative count reaches ceil(pct·n/100) — pure
    * integer rank arithmetic over 2-decimal fixed-point values, no
    * interpolation, so the bound is an actual data value and every
    * engine agrees bit-exactly. Means divide the exact integer cent
    * sum once, in a fixed expression order.
    *
    * Scale shape (100 TB): one (group, value)-keyed count aggregate;
    * the cumulative window runs over the per-group DISTINCT-VALUE
    * frame (value cardinality, not row count — for 2-decimal
    * measures that's bounded by the value range, millions of rows at
    * most); bounds are group-cardinality-sized and broadcast back;
    * one final group aggregate. Compare `percentile`: exact but
    * buffers every ROW of the group in one reducer.
    *
    * Returns (groupCol, n, lo, hi, mean_raw, mean_winsorized,
    * n_clipped_lo, n_clipped_hi).
    */
  def winsorizedStats(df: DataFrame, valueCol: String, groupCol: String,
      pctLo: Int = 5, pctHi: Int = 95): DataFrame = {
    require(0 <= pctLo && pctLo < pctHi && pctHi <= 100,
      s"need 0 <= pctLo < pctHi <= 100: $pctLo, $pctHi")
    val cents = floor(col(valueCol) * lit(100) + lit(0.5)).cast("long")
    val vals = df.select(col(groupCol), cents.as("c"))
    val counts = vals.groupBy(col(groupCol), col("c"))
      .agg(count(lit(1)).as("cnt"))
    val cum = counts.withColumn("cum", sum(col("cnt")).over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol)).orderBy(col("c"))))
    val n = vals.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val bounds = cum.join(n, Seq(groupCol))
      .groupBy(col(groupCol), col("n"))
      .agg(
        min(when(col("cum") >= expr(s"(n * $pctLo + 99) div 100"), col("c")))
          .as("lo_c"),
        min(when(col("cum") >= expr(s"(n * $pctHi + 99) div 100"), col("c")))
          .as("hi_c"))
    vals
      .join(broadcast(bounds), Seq(groupCol))
      .select(col(groupCol), col("c"),
        least(greatest(col("c"), col("lo_c")), col("hi_c")).as("wc"),
        col("lo_c"), col("hi_c"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        (min(col("lo_c")).cast("double") / lit(100.0)).as("lo"),
        (min(col("hi_c")).cast("double") / lit(100.0)).as("hi"),
        (sum(col("c")).cast("double") / count(lit(1)).cast("double") /
          lit(100.0)).as("mean_raw"),
        (sum(col("wc")).cast("double") / count(lit(1)).cast("double") /
          lit(100.0)).as("mean_winsorized"),
        sum(when(col("c") < col("lo_c"), 1L).otherwise(0L))
          .as("n_clipped_lo"),
        sum(when(col("c") > col("hi_c"), 1L).otherwise(0L))
          .as("n_clipped_hi"))
  }
}
