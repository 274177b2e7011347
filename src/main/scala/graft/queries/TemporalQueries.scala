package graft.queries

import graft.Tables
import graft.ops.{AsOfJoin, Transforms}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal operators over the fixture tables: gap sessionization,
  * backward as-of join, and an equi+range interval join — the
  * time-alignment surface a replication/analytics engine needs
  * beyond plain equi-joins.
  */
object TemporalQueries {

  /** q36: per-user session statistics with a 30-minute gap rule. */
  def sessionStats(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    Transforms.sessionize(Seq("user_id"), col("ts"),
      gapMicros = 30L * 60 * 1000000, tieBreak = Seq(col("event_id")))(events)
      .groupBy("user_id")
      .agg(
        max(col("session_id")).as("n_sessions"),
        count(lit(1)).as("n_events"),
        (count(lit(1)).cast("double") / max(col("session_id")).cast("double"))
          .as("events_per_session"))
      .orderBy("user_id")
  }

  /** q65: sequence funnel (ClickHouse windowFunnel re-expressed
    * Spark-first) — per user, the earliest strictly-ordered
    * view → click → purchase chain, reported as the reached depth
    * plus the stage timestamps in epoch µs (exact integers — no
    * timestamp rendering ambiguity across engines).
    *
    * Shape: one aggregation per funnel stage, each keyed on user_id;
    * every stage joins the (user-keyed) previous frontier and
    * min-aggregates the next event time. All three shuffles hash the
    * SAME key, so Catalyst reuses the partitioning across stages —
    * the plan is a chain of co-partitioned joins+aggs, never a
    * per-user sort of the whole event stream, and never a stateful
    * row-by-row scan like the native windowFunnel (which must see
    * each user's events in time order on one node).
    */
  def funnelDepth(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
    def stage(of: String, after: DataFrame, afterCol: String): DataFrame =
      ev.filter(col("event_type") === of)
        .join(after, "user_id")
        .filter(col("us") > col(afterCol))
        .groupBy("user_id").agg(min(col("us")).as(s"${of}_us"))
    // each frontier is referenced by BOTH the next stage and the
    // final join — materialize (user-count-sized frames) or Catalyst
    // re-evaluates the whole upstream chain per reference, re-scanning
    // events 6× instead of 3× (once per stage)
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("view_us"))
      .localCheckpoint()
    val clicks = stage("click", views, "view_us").localCheckpoint()
    val purchases = stage("purchase", clicks, "click_us")
    views
      .join(clicks, Seq("user_id"), "left")
      .join(purchases, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("purchase_us").isNotNull, 3)
          .when(col("click_us").isNotNull, 2)
          .otherwise(1).cast("long").as("depth"),
        col("view_us"), col("click_us"), col("purchase_us"))
      .orderBy(col("user_id"))
  }

  /** q37: backward as-of join — each event matched to the user's
    * latest order at or before the event time. The right side is
    * pre-deduplicated to one order per (customer, timestamp) so tie
    * semantics are engine-independent.
    */
  def asOfOrders(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val orders = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    AsOfJoin.backward(
      events.select(col("user_id"), col("event_id"), col("ts")),
      orders, leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate")
      .select(col("user_id"), col("event_id"), col("o_orderkey"))
      .orderBy("user_id", "event_id")
  }

  /** q38: interval (equi + range) self-join — activity bursts: for
    * each user, pairs of their events within a 6-hour lookback.
    * Plans as an equi-join on the user key with the time range as a
    * join-time filter — no cross-product; at 100 TB the range stays
    * a per-key filter after the single key shuffle.
    */
  def eventBursts(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("em"))
    val a = events.select(col("user_id"), col("event_id").as("eid_a"),
      col("em").as("ma"))
    val b = events.select(col("user_id").as("uid_b"),
      col("event_id").as("eid_b"), col("em").as("mb"))
    val sixHoursMicros = 6L * 3600 * 1000000
    a.join(b,
        col("user_id") === col("uid_b") &&
          col("mb") >= col("ma") - lit(sixHoursMicros) &&
          col("mb") < col("ma"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("eid_b")).as("n_predecessors"))
      .orderBy("user_id")
  }

  /** q79: gap-filled hourly purchase counts — the aggregated series
    * resampled onto the full hourly calendar spine, quiet hours as
    * explicit zeros (Transforms.gapFill).
    */
  def gapFilledHourly(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    Transforms.gapFill(counts, "h", "1 HOUR", Map("n" -> 0L))
      .select(date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("n"))
      .orderBy("hour")
  }

  /** q108: per-user daily LOCF resample — each user's value series
    * re-gridded onto the full daily calendar between their first and
    * last observation, missing days carried forward from the last
    * observed day (last-observation-carried-forward — the
    * interpolating counterpart of q79's zero-fill). The observed
    * value of a day is its LAST event by (ts, event_id); carried
    * values are copied verbatim (no arithmetic), so every output
    * double is bit-identical to an input double.
    *
    * Scale shape: one shuffle keyed on user_id (the daily
    * aggregate); the span aggregate, calendar explode (bounded by
    * the observed span), grid join and LOCF window all stay on that
    * key — no global sort, no SinglePartition window, per-user state
    * O(span).
    */
  def locfDaily(spark: SparkSession, dir: String): DataFrame = {
    Transforms.locfDaily(Tables.load(spark, dir, "events"),
        keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
        valCol = "value")
      // string-rendered like q89's cohort_day: a DATE column
      // hash-mismatches across engines' date representations
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("value"), col("filled"))
      .orderBy("user_id", "day")
  }

  /** q85: trailing z-score anomaly detection — flag events whose
    * value sits more than 2σ from the mean of the SAME user's
    * previous 20 events (a leading frame would leak the future; the
    * trailing frame is the streaming-compatible form).
    *
    * Determinism across engines: the windowed sums run in
    * DECIMAL(12,2)/(25,4) (order-independent exact accumulation —
    * a double sum would depend on row order within the frame), and
    * the mean/variance/z finishers are double ops written in the
    * same expression order on both sides, so every IEEE step rounds
    * identically. Variance via E[x²]−mean² — one pass, no second
    * frame scan.
    *
    * Scale shape: one shuffle on user_id, one sorted pass per user;
    * frames are ROWS-bounded so state per row is O(1).
    */
  def valueAnomalies(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-20, -1)
    val dec = col("value").cast("decimal(12,2)")
    val s1 = sum(dec).over(w).cast("double")
    val s2 = sum(dec * dec).over(w).cast("double")
    val n = count(lit(1)).over(w)
    val mean = s1 / n.cast("double")
    val variance = s2 / n.cast("double") - mean * mean
    val z = (col("value") - mean) / sqrt(variance)
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        n.as("n_prev"), mean.as("trail_mean"), z.as("zscore"))
      .filter(col("n_prev") >= 10 && abs(col("zscore")) > 2.0)
      .orderBy("user_id", "event_id")
  }

  /** q89: cohort retention — the product-analytics staple: users
    * grouped by first-activity day (their cohort), then distinct
    * active users counted at each day offset from the cohort day.
    *
    * Scale shape: the cohort frame and the activity frame shuffle on
    * the SAME key (user_id), so the join reuses the aggregation's
    * exchange; the final (cohort, offset) aggregate is
    * calendar-bounded output. countDistinct(user) inside is the one
    * genuinely heavy term — it re-shuffles (cohort, offset, user)
    * once, which is the minimum for an exact distinct.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame =
    Transforms.cohortRetention(Tables.load(spark, dir, "events"))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_active"))
      .orderBy("cohort_day", "day_offset")

  /** q130: SCD-type-2 history of each user's event_type — validity
    * intervals [valid_from, valid_to) per run of equal values in
    * event-time order (ties broken by event_id), open interval for
    * the current state.
    */
  def userTypeScd2(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Scd.scd2Intervals(Tables.load(spark, dir, "events"),
        col("user_id"), col("event_type"), col("ts"), col("event_id"))
      // (key, version) is the output's total order — valid_from can
      // tie across consecutive runs on equal-timestamp changes
      .orderBy("key", "version")

  /** q135: first-order Markov transition matrix of per-user
    * event_type sequences — exact counts, integer ppm row
    * probabilities.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Markov.transitionMatrix(Tables.load(spark, dir, "events"),
        col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .orderBy("prev", "next")

  /** q136: CUSUM drift detection over the per-type daily event
    * volume — integer closed-form CUSUM against the per-type floor
    * mean, flags where the statistic exceeds 3× the mean.
    */
  def dailyVolumeCusum(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    graft.ops.Cusum.cusumScores(daily,
        col("event_type"), col("day"), col("n"),
        // one row per (type, day) after the aggregate: the day is its
        // own (trivially unique) tie-break
        tieCol = col("day"))
      .orderBy("key", "ord")
  }

  /** q137: snapshot diff of each user's current state against the
    * state just before their last event — TableDiff keyed on
    * user_id: single-event users report "added", last-event type
    * changes report "changed" with the column list; unchanged users
    * are absent (the reconciliation-report contract).
    */
  def lastEventStateDiff(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val ranked = Tables.load(spark, dir, "events")
      .withColumn("__rn", row_number().over(w))
    val after = ranked.filter(col("__rn") === 1)
      .select(col("user_id"), col("event_type"))
    val before = ranked.filter(col("__rn") === 2)
      .select(col("user_id"), col("event_type"))
    graft.migrate.TableDiff.diff(before, after, Seq("user_id"))
      .orderBy("user_id")
  }
}
