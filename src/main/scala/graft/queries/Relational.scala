package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational operator surface (SURVEY.md §2.3-§2.9).
  *
  * The reference's only query shape is `SELECT cols FROM t [WHERE]`
  * (tablemigrator.py:191-194); everything else here is the
  * capability set the north star requires the Spark engine to own
  * directly: joins, aggregations, windows, set ops, sorts/limits.
  *
  * Oracle-parity rules used throughout (driver hash-compares against
  * DuckDB): money math is done in DECIMAL (exact, engine-independent)
  * and only cast to DOUBLE at the end; every query ends in a
  * deterministic ORDER BY with a unique tiebreaker.
  */
object Relational {

  /** Cast to exact decimal before aggregating so Spark and the DuckDB
    * oracle produce bit-identical doubles regardless of accumulation
    * order (fp sums are order-dependent; decimal sums are not).
    * Precision 12 keeps chained products under both engines' 38-digit
    * cap (DuckDB falls back to inexact DOUBLE past 38).
    */
  private def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** q01: TPC-H Q1-shaped pricing summary — groupBy aggregation with
    * partial (map-side) aggregation; at scale this shuffles only the
    * tiny per-group partials.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("2001-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
          * (lit(1) + dec2(col("l_tax")))).cast(DoubleType).as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(dec2(col("l_extendedprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q02: projection + row predicate — P2/P3 in SURVEY §2.3. Both the
    * filter and the 4-column projection push into the parquet scan
    * (PushedFilters / ReadSchema in explain output).
    */
  def filterProject(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= lit("1998-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1999-01-01").cast(TimestampType) &&
        col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** q03: 3-way join + aggregation (customer ⋈ orders ⋈ lineitem).
    * customer/orders vs lineitem are shuffle joins on their keys; at
    * 100 TB AQE picks shuffled-hash vs sort-merge and splits skew.
    */
  def joinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(100)
  }

  /** q04: broadcast dimension join — `part` is a dimension table, so
    * we broadcast it explicitly instead of shuffling the fact table
    * (the decisive optimization at 100 TB: lineitem never moves).
    */
  def broadcastDimJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val p = Tables.load(spark, dir, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec2(col("l_extendedprice"))).cast(DoubleType).as("total_price"),
        sum(dec2(col("l_quantity"))).cast(DoubleType).as("total_qty"))
      .orderBy(col("p_brand"))
  }

  /** q05: snowflake join chain region ⋈ nation ⋈ customer ⋈ orders —
    * region/nation broadcast (tiny), customer⋈orders shuffles once.
    */
  def nationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.load(spark, dir, "region")
    val n = Tables.load(spark, dir, "nation")
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec2(col("o_totalprice"))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** q06: ranking window — top-3 events per user by value
    * (row_number over a per-key window; SURVEY §2.6).
    */
  def topEventsPerUser(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    e.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("user_id"), col("rnk"), col("event_id"), col("event_type"),
        col("value"))
      .orderBy(col("user_id"), col("rnk"))
  }

  /** q07: running aggregate window — cumulative sum of value per user
    * in event-time order (frame = unbounded preceding..current).
    */
  def runningSumPerUser(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("running_value",
        sum(dec2(col("value"))).over(w).cast(DoubleType))
      .select(col("user_id"), col("event_id"), col("value"),
        col("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q08: ReplacingMergeTree FINAL analog (SURVEY §2.5,
    * tablesqlbuilder.py:392-398): last-write-wins snapshot per key —
    * the read-time dedup view the reference delegates to ClickHouse.
    */
  def replacingFinalState(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    graft.ops.Transforms.replacingFinal(
      Seq("user_id"), Seq(col("ts"), col("event_id")))(e)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** q09: multi-table UNION routing (SURVEY §2.8 U1) — the `log_* →
    * logunified` scenario: several sources with *different* column
    * sets unioned by name into one destination, tagged with their
    * origin. Missing columns become NULL (allowMissingColumns).
    */
  def unionRouting(spark: SparkSession, dir: String): DataFrame = {
    // Two filtered reads of one fixture table stand in for two
    // DIFFERENT source tables (log_click / log_view): in the real
    // scenario each branch scans its own table, so the two scans
    // here model the production shape, not a missed optimization.
    val e = Tables.load(spark, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("value"),
        lit("log_click").as("src_table"))
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"),
        lit("log_view").as("src_table")) // no `value` column
    clicks.unionByName(views, allowMissingColumns = true)
      .orderBy(col("event_id"))
  }

  /** q10: INTERSECT — customers active in both 1997 and 1998. */
  def intersectCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val y97 = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
    val y98 = o.filter(year(col("o_orderdate")) === 1998).select(col("o_custkey"))
    y97.intersect(y98).orderBy(col("o_custkey"))
  }

  /** q53: ranking-window variants — spend quartiles (ntile) and
    * percent_rank per customer within their order-priority class.
    * Both are rank-family functions: one shuffle on the partition
    * key, one sorted pass; percent_rank needs the partition row
    * count, which the same window pass provides.
    */
  def customerSpendQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val spend = o.groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(sum(dec2(col("o_totalprice"))).cast(DoubleType).as("spend"))
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("spend").desc, col("o_custkey"))
    spend.select(col("o_custkey"), col("o_orderpriority"), col("spend"),
        ntile(4).over(w).as("quartile"),
        graft.text.TextAnalysis.round6(percent_rank().over(w)).as("pr"))
      .orderBy("o_orderpriority", "o_custkey")
  }

  /** q52: EXCEPT (set difference with dedup) — customers ordering in
    * 1997 but not 1998. Plans as a left-anti join over distinct
    * rows, same bucketed shuffle shape as intersect.
    */
  def exceptCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val y97 = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
    val y98 = o.filter(year(col("o_orderdate")) === 1998).select(col("o_custkey"))
    y97.except(y98).orderBy(col("o_custkey"))
  }

  /** q11: anti-join (NOT EXISTS) — customers with no high-value
    * orders. The filter on the probe side is pushed below the join,
    * shrinking the build side before any shuffle.
    */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** q12: top-k — Spark plans TakeOrderedAndProject (no full sort:
    * per-partition heap + driver merge; the right plan at any scale).
    */
  def topOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  /** q13: ROLLUP — hierarchical subtotals (SURVEY §2.5 built-ins). */
  def rollupSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** q49: CUBE with grouping_id — all 2^k grouping-set combinations
    * in ONE pass (Spark's Expand: each input row fans out once per
    * grouping set before the partial aggregation, so the cost is
    * sets × scan, never sets separate scans). grouping_id
    * disambiguates a real NULL key from a subtotal row — without it
    * rollup/cube output is ambiguous on nullable keys.
    */
  def cubeSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_items"),
        sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** q50: PIVOT — daily event counts spread across one column per
    * event type. The explicit value list matters twice over: it
    * keeps the output schema deterministic (no extra pass to
    * discover values), and at scale an UNLISTED pivot first runs a
    * distinct-collect over the pivot column — a hidden job on 100 TB
    * of events. Pivot compiles to one conditional aggregation pass
    * (count(when(type = v, 1)) per v), not one scan per column.
    */
  def dailyEventPivot(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("day")
  }

  /** q14: DISTINCT aggregation — count(distinct) triggers Spark's
    * two-phase expand+agg; paired with a plain count in one pass.
    */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast(DoubleType).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  /** q15: JSON property extraction (SURVEY §2.9 — the reference
    * stringifies JSON; we make it queryable). regexp-based so the
    * DuckDB oracle agrees without the json extension.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.withColumn("k",
        regexp_extract(col("props"), "\"k\"\\s*:\\s*(\\d+)", 1)
          .cast(IntegerType))
      .groupBy(floor(col("k") / 10).cast(IntegerType).as("k_decile"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast(DoubleType).as("total_value"))
      .orderBy(col("k_decile"))
  }

  /** q54: GROUPING SETS — arbitrary subtotal combinations, the
    * general form cube/rollup specialize (SURVEY §2.5). The chosen
    * sets ((priority, status), (status), ()) are NOT a rollup prefix
    * chain — (status) alone drops the leading key — so this exercises
    * the set-list surface specifically. Like cube, Spark plans ONE
    * Expand + partial aggregation pass: each input row fans out once
    * per set before the map-side combine, so the scan count stays 1
    * no matter how many sets are requested.
    */
  def groupingSetsSummary(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        grouping_id().cast(LongType).as("gid"),
        count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast(DoubleType).as("total"))
      .orderBy(col("gid"),
        col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)
  }

  /** q55: generator/UDTF surface (SURVEY §2.11) — explode a split
    * array into rows, then aggregate: corpus-wide token frequency
    * top-25. The explode is Spark's built-in Generate operator
    * (codegen'd, no UDTF interpreter); the count is a standard
    * partial+final hash aggregation over the generated rows, and the
    * top-25 plans as TakeOrderedAndProject — at 100 TB the only full
    * shuffle is the per-token partial counts, not the exploded rows.
    */
  def tokenFrequency(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(25)
  }

  /** q56: LEFT SEMI join (EXISTS) — customers with at least one
    * urgent high-value order. Semi joins at scale beat the
    * equivalent inner-join+distinct: the build side stores keys
    * only, each probe row emits at most once, and no post-join
    * dedup shuffle is needed. The order-side filter pushes below
    * the join into the parquet scan.
    */
  def customersWithUrgentOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 350000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** q57: scalar-function family sampler (SURVEY §2.9) — date parts
    * (year/month/ISO day-of-week), string ops (split-index, lower,
    * concat_ws, length), math (floor, modulo) in one row-level
    * projection. All are codegen'd built-ins inside one
    * WholeStageCodegen span over the scan — zero shuffles; the
    * key-sampling filter pushes into the parquet scan. Cross-engine
    * notes: Spark `weekday` is 0=Monday, DuckDB `isodow` 1=Monday,
    * hence the +1; int-typed results are cast to long to match
    * DuckDB's BIGINT function results bit-for-bit.
    */
  def scalarFunctionShowcase(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.filter(pmod(col("o_orderkey"), lit(1000)) === 0)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("yr"),
        month(col("o_orderdate")).cast(LongType).as("mo"),
        (weekday(col("o_orderdate")) + 1).cast(LongType).as("iso_dow"),
        element_at(split(col("o_orderpriority"), "-"), 2).as("pr_word"),
        lower(col("o_orderstatus")).as("status_lc"),
        concat_ws("#", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
        floor(col("o_totalprice")).cast(LongType).as("price_floor"),
        length(col("o_orderpriority")).cast(LongType).as("pr_len"),
        (col("o_orderkey") % 7).as("key_mod7"))
      .orderBy(col("o_orderkey"))
  }

  /** q58: array-function family (SURVEY §2.9) — per-document token
    * array statistics via higher-order functions: filter (drop empty
    * tokens), array_distinct, array_min/max (binary UTF-8 order in
    * both engines), array_contains. Everything is per-row inside one
    * codegen span; no shuffle at any scale. The repeated `toks`
    * subtree is eliminated by codegen common-subexpression handling
    * within the single projection.
    */
  def arrayFunctionShowcase(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val toks = filter(split(col("text"), " "), t => t =!= "")
    d.select(
        col("doc_id"),
        size(toks).cast(LongType).as("n_toks"),
        size(array_distinct(toks)).cast(LongType).as("n_distinct"),
        array_min(toks).as("tok_min"),
        array_max(toks).as("tok_max"),
        array_contains(toks, "the").as("has_the"))
      .orderBy(col("doc_id"))
  }

  /** q62: RANGE-frame window (SURVEY §2.6) — per-user trailing
    * 30-minute event count and value sum. RANGE frames differ from
    * ROWS frames on tied order keys: all peers share one frame, so
    * the result is deterministic even with duplicate timestamps
    * (a ROWS frame over ties would depend on physical row order).
    * The frame bound is in epoch microseconds — `unix_micros` ==
    * DuckDB `epoch_us` bit-for-bit under UTC. One shuffle on
    * user_id; the frame scan is a single sorted pass per partition
    * with a sliding accumulator, not a per-row rescan.
    */
  def trailingWindowStats(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts").cast(TimestampType)))
      .rangeBetween(-30L * 60 * 1000000, Window.currentRow)
    e.select(col("user_id"), col("event_id"), col("value"),
        count(lit(1)).over(w).as("n_30m"),
        sum(dec2(col("value"))).over(w).cast(DoubleType).as("v_30m"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q63: typed UDAF (SURVEY §2.11) — quantity-weighted mean price
    * per return flag through a custom `Aggregator[In, Acc, Double]`
    * (graft.functions.WeightedMean). An Aggregator compiles to a
    * regular two-phase aggregate: only per-group (Σvw, Σw) buffers
    * shuffle, never rows — the UDAF costs the same plan shape as a
    * built-in. Buffers are exact BigDecimal (associative +
    * commutative), so partial-aggregation order cannot perturb the
    * result; inputs are pre-cast to DECIMAL(12,2) so the one
    * double→decimal rounding happens in Catalyst, mirroring the
    * oracle.
    */
  def weightedAvgPrice(spark: SparkSession, dir: String): DataFrame = {
    val wm = udaf(graft.functions.WeightedMean)
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(wm(dec2(col("l_extendedprice")), dec2(col("l_quantity")))
        .as("wavg_price"))
      .orderBy(col("l_returnflag"))
  }

  /** q64: skew-mitigated join (SURVEY §2.4 at 100 TB) — the revenue
    * join routed through ops/SkewJoin.saltedJoin: the 100 heaviest
    * order keys are salted across 8 sub-keys (their matching order
    * rows replicated 8×), cold keys join 1:1 untouched. The result
    * is IDENTICAL to the plain join — the oracle is the plain SQL
    * join — which is the point: salting is a physical rebalance, not
    * a semantic change. On the uniform fixture this costs a little
    * (hot-key discovery + replication); on a power-law 100-TB key it
    * converts one straggler reducer into 8 parallel ones.
    */
  def skewJoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), dec2(col("l_extendedprice")).as("price"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val hot = li.groupBy("l_orderkey").count()
      .orderBy(col("count").desc, col("l_orderkey")).limit(100)
      .select("l_orderkey")
    graft.ops.SkewJoin.saltedJoin(li, o, Seq("l_orderkey"), hot,
        saltFactor = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("price")).cast(DoubleType).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** q66: lag/lead analytics (SURVEY §2.6) — per-user inter-event
    * gap (lag) and next event type (lead) in one window pass. Both
    * functions share a single (partition, order) spec, so Spark
    * evaluates them in ONE sorted scan per user partition — adding
    * analytic columns to an existing window is free; a second
    * differing window spec would cost another sort. Timestamps are
    * differenced as epoch µs integers (exact in both engines).
    */
  def interEventGaps(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val us = unix_micros(col("ts").cast(TimestampType))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(us, col("event_id"))
    e.select(col("user_id"), col("event_id"), col("event_type"),
        (us - lag(us, 1).over(w)).as("gap_us"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** q67: grouped exact percentiles (SURVEY §2.5/§2.6) — median and
    * p95 of the event value per event type. Unlike q45's whole-table
    * profile, the percentile here is a grouped aggregate: each
    * group's values are buffered and ranked within its partial
    * aggregation — one shuffle on the group key, no global sort.
    * Interpolation (index p·(n−1), linear in doubles) matches
    * DuckDB's quantile_cont bit-for-bit — same sorted values, same
    * two IEEE ops (q45 established this for the whole-table form).
    */
  def groupedPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        percentile(col("value"), lit(0.5)).as("p50"),
        percentile(col("value"), lit(0.95)).as("p95"))
      .orderBy(col("event_type"))
  }

  /** q16: event-time tumbling window aggregation (SURVEY §2.10 T5) —
    * batch form of the streaming windowed agg; 1-hour buckets.
    */
  def hourlyEventAgg(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    // Bucket rendered as a string: timestamp columns round-trip with
    // engine-specific tz-awareness, strings are unambiguous.
    e.groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast(DoubleType).as("total_value"))
      .orderBy(col("hour"), col("event_type"))
  }
}
