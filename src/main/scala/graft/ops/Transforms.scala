package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Converter surface re-expressed as `DataFrame => DataFrame`
  * transforms — the Spark-native equivalent of the reference's
  * row-by-row converter chain (converter/chwriteconverter.py,
  * csvwriteconverter.py, csvreadconverter.py in /root/reference).
  *
  * Each transform is a pure column expression so Catalyst folds it
  * into the scan/write plan (whole-stage codegen, pushdown) instead
  * of the reference's per-row Python dict mutation.
  */
object Transforms {

  /** Column pruning, `--column-skip` (tablesqlbuilder.py:199-201,
    * tablemigrator.py:226-237). `df.drop` prunes all the way into the
    * source scan via Catalyst's ColumnPruning rule.
    */
  def skipColumns(cols: Seq[String])(df: DataFrame): DataFrame =
    df.drop(cols: _*)

  /** NULL-default substitution, `--column-default-value k=v`
    * (converter/csvwriteconverter.py:19-33).
    */
  def fillDefaults(defaults: Map[String, Any])(df: DataFrame): DataFrame =
    df.na.fill(defaults)

  /** Empty-string → NULL normalization on read
    * (converter/csvreadconverter.py:10-22). Applied to all string
    * columns unless a subset is given.
    */
  def emptyToNull(cols: Seq[String] = Nil)(df: DataFrame): DataFrame = {
    val targets =
      if (cols.nonEmpty) cols.toSet
      else df.schema.collect { case StructField(n, StringType, _, _) => n }.toSet
    val exprs = df.schema.fields.map { f =>
      if (targets(f.name))
        when(col(f.name) === lit(""), lit(null)).otherwise(col(f.name)).as(f.name)
      else col(f.name)
    }
    df.select(exprs.toIndexedSeq: _*)
  }

  /** Sink-side stringification of non-scalar values — the Spark
    * analog of CHWriteConverter.column() (chwriteconverter.py:17-41:
    * timedelta/bytes/Decimal/dict/list/set → str) and the Decimal→str
    * pass in chwriter.py:77-81. Unlike the reference we keep a typed
    * escape hatch: binary → hex, complex → JSON, everything else a
    * plain cast.
    */
  def stringifyForSink(df: DataFrame): DataFrame = {
    val exprs = df.schema.fields.map { f =>
      val c = col(f.name)
      val s = f.dataType match {
        case StringType                             => c
        case BinaryType                             => lower(hex(c))
        case _: ArrayType | _: MapType | _: StructType => to_json(c)
        case _                                      => c.cast(StringType)
      }
      s.as(f.name)
    }
    df.select(exprs.toIndexedSeq: _*)
  }

  /** Deterministic column layout: the CSV writer sorts fieldnames
    * (writer/csvwriter.py:122).
    */
  def sortedColumns(df: DataFrame): DataFrame =
    df.select(df.columns.sorted.toIndexedSeq.map(col): _*)

  /** ClickHouse ReplacingMergeTree "FINAL" analog
    * (tablesqlbuilder.py:392-398): last-write-wins per primary key,
    * version = highest (`orderCols` descending picks the survivor).
    *
    * Scale note: one hash-shuffle on the PK, then a single window
    * scan per partition; at 100 TB this is the standard
    * partition-by-key top-1 and benefits from AQE skew splitting.
    */
  def replacingFinal(pk: Seq[String], orderCols: Seq[Column])(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Gap-based sessionization: assigns a per-key session id that
    * increments whenever the time since the previous row exceeds
    * `gapMicros`. One shuffle on the key + one window scan — the
    * batch analog of a streaming session window, exact and
    * deterministic (microsecond integer arithmetic; `tieBreak`
    * disambiguates equal timestamps).
    */
  def sessionize(key: Seq[String], ts: Column, gapMicros: Long,
      tieBreak: Seq[Column] = Nil)(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(ts +: tieBreak: _*)
    val micros = unix_micros(ts.cast("timestamp"))
    val gap = micros - lag(micros, 1).over(w)
    val boundary = when(gap.isNull || gap > gapMicros, 1).otherwise(0)
    df.withColumn("session_id",
      sum(boundary).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** Calendar gap fill for bucketed time series: left-join `df`
    * (one row per time bucket in `tsCol`) onto the complete spine of
    * `step`-spaced buckets between its own min and max (inclusive),
    * filling the absent buckets' columns from `fill` — the resample
    * step that turns "hours with events" into "every hour, zeros
    * where quiet" for monitoring and training-telemetry series.
    *
    * Scale shape: the spine is bounded by wall-clock span ÷ step
    * (driver-sized even over 100 TB of events — a decade of hours is
    * 87,600 rows), generated as one `sequence` explode and joined
    * against the ALREADY-aggregated buckets, so the join is
    * spine × buckets, never touching raw rows.
    */
  def gapFill(df: DataFrame, tsCol: String, step: String,
      fill: Map[String, Any]): DataFrame = {
    val b = df.agg(min(col(tsCol)), max(col(tsCol))).head()
    if (b.isNullAt(0)) return df // no buckets → nothing to fill
    val spine = df.sparkSession.range(1).select(
      explode(sequence(lit(b.getTimestamp(0)), lit(b.getTimestamp(1)),
        expr(s"INTERVAL $step"))).as(tsCol))
    spine.join(df, Seq(tsCol), "left").na.fill(fill)
  }

  /** Per-key daily LOCF resample — each key's value series re-gridded
    * onto the full daily calendar between its first and last
    * observation, missing days carried forward from the last observed
    * day (last-observation-carried-forward — the interpolating
    * counterpart of [[gapFill]]'s constant fill, and per-KEY where
    * gapFill's spine is global). The observed value of a day is its
    * LAST row by (tsCol, tieCol); carried values are copied verbatim
    * (no arithmetic), so every output value is bit-identical to an
    * input value. Returns (keyCol, day: date, value, filled: int).
    *
    * Scale shape: one shuffle keyed on `keyCol` (the daily
    * aggregate); the span aggregate, calendar explode (bounded by the
    * observed span), grid join and LOCF window all stay on that key —
    * no global sort, no SinglePartition window, per-key state
    * O(span).
    */
  def locfDaily(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df
      .groupBy(col(keyCol), date_trunc("DAY", col(tsCol)).cast("date").as("day"))
      .agg(max_by(col(valCol), struct(col(tsCol), col(tieCol))).as("__v"))
    val grid = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col(keyCol),
        explode(transform(
          sequence(col("lo"), col("hi"), expr("INTERVAL 1 DAY")),
          d => d.cast("date"))).as("day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    grid.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        last(col("__v"), ignoreNulls = true).over(w).as("value"),
        when(col("__v").isNull, lit(1)).otherwise(lit(0)).as("filled"))
  }

  /** Cohort retention: group users by FIRST-activity day (their
    * cohort) and count distinct active users at each day offset from
    * it — the product-analytics staple. Returns
    * (cohort_day: date, day_offset: int, n_active: long).
    *
    * Scale shape: the cohort frame and the activity frame shuffle on
    * the SAME key (`userCol`), so the join reuses the aggregation's
    * exchange; the output is calendar²-bounded. The inner exact
    * countDistinct re-shuffles (cohort, offset, user) once — the
    * minimum for an exact distinct (swap in approx_count_distinct
    * when ±2% is acceptable at 100 TB).
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val ev = events.select(col(userCol), to_date(col(tsCol)).as("day"))
    val cohorts = ev.groupBy(userCol).agg(min(col("day")).as("cohort_day"))
    ev.join(cohorts, userCol)
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col(userCol)).as("n_active"))
  }

  /** Integer EWMA smoothing (α = 1/2) — the exponentially-weighted
    * moving average per key over the event-time order, the standard
    * de-noising step before thresholding a metric stream. All
    * arithmetic is 64-bit integer on 2-decimal fixed-point values:
    * s₁ = v₁, sᵢ = (sᵢ₋₁ + vᵢ) div 2 — the α=½ recurrence with floor
    * division, bit-reproducible in any engine (a float EWMA's value
    * depends on summation order and ulp behavior; the integer floor
    * at each step is a deliberate part of the contract).
    *
    * An EWMA with per-step flooring is a NON-associative linear
    * recurrence, so it cannot be a shuffle-free window scan: the
    * per-key event array is collected once (bounded by per-key
    * activity — the same contract as sessionize) and folded in
    * (tsCol, idCol) order. One shuffle on the key, no joins.
    * Returns (keyCol, n_events, last_value, ewma).
    */
  def ewmaHalf(df: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      valCol: String = "value"): DataFrame = {
    val cents = floor(col(valCol) * lit(100) + lit(0.5)).cast("long")
    df.select(col(keyCol),
        struct(col(tsCol), col(idCol), cents.as("c")).as("e"))
      .groupBy(col(keyCol))
      .agg(
        transform(sort_array(collect_list(col("e"))), e => e("c")).as("cs"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("n_events"),
        (element_at(col("cs"), -1).cast("double") / lit(100.0))
          .as("last_value"),
        (expr("aggregate(slice(cs, 2, size(cs) - 1), cs[0], " +
          "(acc, x) -> (acc + x) div 2)").cast("double") / lit(100.0))
          .as("ewma"))
  }

  /** Per-table pluggable row transform registry — the Spark analog of
    * the `--ch-converter-file`/`--ch-converter-class` plugin surface
    * (clioptions.py:492-503, converter/converter.py:9-35). Instead of
    * dynamically imported Python classes, users register plain
    * `DataFrame => DataFrame` functions keyed by table name; these
    * stay inside Catalyst when written with Column expressions.
    */
  final class TransformRegistry {
    private var transforms = Map.empty[String, DataFrame => DataFrame]
    def register(table: String, t: DataFrame => DataFrame): this.type = {
      transforms += table -> t; this
    }
    def apply(table: String, df: DataFrame): DataFrame =
      transforms.get(table).fold(df)(_.apply(df))
  }

  /** Reflective converter lookup — the CLI half of the plugin surface
    * (`--ch-converter-file`/`--ch-converter-class`, util.py:40-48 and
    * clioptions.py:492-503 in /root/reference). The reference imports
    * a Python class from an arbitrary file; the JVM analog is a
    * no-arg class on the CLASSPATH implementing
    * `DataFrame => DataFrame` (ship it in a jar next to the app —
    * there is no runtime Scala compiler on a cluster). Registration
    * failures are loud at startup, not at first use mid-migration.
    */
  def converterInstance(className: String): DataFrame => DataFrame = {
    val inst =
      try Class.forName(className).getDeclaredConstructor().newInstance()
      catch {
        case e: ClassNotFoundException => throw new IllegalArgumentException(
          s"--converter-class $className not on the classpath", e)
        case e: NoSuchMethodException => throw new IllegalArgumentException(
          s"--converter-class $className needs a public no-arg constructor", e)
      }
    inst match {
      case f: Function1[_, _] => f.asInstanceOf[DataFrame => DataFrame]
      case other => throw new IllegalArgumentException(
        s"--converter-class $className must implement DataFrame => DataFrame, " +
          s"got ${other.getClass.getName}")
    }
  }
}
