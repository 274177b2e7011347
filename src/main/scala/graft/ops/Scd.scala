package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) interval builder: collapse a
  * change log into validity intervals — one row per (key, run of
  * equal attribute values) carrying `[valid_from, valid_to)`, open
  * intervals (`valid_to` NULL) for the current state. The dimension-
  * history table every warehouse keeps next to a CDC feed; the
  * reference replays MySQL row events into ClickHouse current-state
  * tables (datamigrator.py in /root/reference) — this derives the
  * full history view those replays discard.
  *
  * Classic gaps-and-islands: a change flag where the value differs
  * from its predecessor, a running sum of flags to number runs, one
  * group-by to collapse each run, a lead() to close each interval at
  * the next run's start. Deterministic: rows are totally ordered by
  * (`ts`, tie-break id) within each key.
  *
  * Scale shape: both windows and the group-by are partitioned by the
  * entity key — ONE hash shuffle on `key` feeds all four steps
  * (Spark reuses the exchange; no single-partition window, no
  * global sort). State never leaves the executors.
  */
object Scd {

  /** (key, version, value, valid_from, valid_to, n_events) intervals
    * for the change log `df`; `tieCol` breaks equal-timestamp ties to
    * keep the run numbering total and engine-independent. `version`
    * is the 1-based run number — the standard SCD-2 row version, and
    * the column that makes (key, version) a TOTAL order on the
    * output: two consecutive runs can share `valid_from` when a value
    * change happens at an equal timestamp, so (key, valid_from) alone
    * cannot deterministically order the history.
    */
  def scd2Intervals(df: DataFrame, keyCol: Column, valueCol: Column,
      tsCol: Column, tieCol: Column): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    // null-safe change detection: NULL is a value of its own (a run
    // of NULLs is one interval, and NULL→x / x→NULL are changes);
    // the first row per key always opens a run — `lag IS NULL` can't
    // distinguish it when the first value itself is NULL, so the row
    // number does
    val runs = df
      .withColumn("chg",
        when(row_number().over(byKey) === 1 ||
          !(lag(valueCol, 1).over(byKey) <=> valueCol), 1L).otherwise(0L))
      .withColumn("run", sum(col("chg")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keyCol.as("key"), col("run"))
      // value is run-constant by construction; min() (not first())
      // keeps the aggregate formally order-independent anyway
      .agg(min(valueCol).as("value"), min(tsCol).as("valid_from"),
        count(lit(1)).as("n_events"))
    val byRun = Window.partitionBy(col("key")).orderBy(col("run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .select(col("key"), col("run").as("version"), col("value"),
        col("valid_from"), col("valid_to"), col("n_events"))
  }
}
