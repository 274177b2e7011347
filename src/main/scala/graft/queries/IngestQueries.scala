package graft.queries

import graft.Tables
import graft.cdc.ChangeFeed
import graft.migrate.Migrator
import graft.sources.{CsvSource, JdbcSink, JdbcSnapshot, JsonSource, OrcSource, XmlSource}
import graft.streaming.StreamingCdc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** Ingest-surface and streaming-path queries: each proves an
  * end-to-end pipeline (migrate / CSV round-trip / streaming CDC /
  * streaming event-time aggregation) and exposes the result as a
  * verifiable DataFrame. These entries spend their time on local
  * disk round-trips by design — they are correctness probes, listed
  * in SparkEntry.benchExclude.
  */
object IngestQueries {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val DerbyDriver = Some("org.apache.derby.jdbc.EmbeddedDriver")

  private def execSql(url: String, sqls: String*): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      sqls.foreach(st.execute)
    } finally conn.close()
  }

  /** q68: LIVE incremental CDC over JDBC — the replication loop the
    * reference actually is (mysqlreader.py:362-448 in
    * /root/reference: tail the source, resume from a persisted
    * position, land changes downstream), self-contained: an embedded
    * Derby database plays the live source, the graft-jdbc
    * MicroBatchStream polls it keyed on the PK, and each micro-batch
    * merges into the bucketed copy-on-write state store. Two-phase
    * proof: a third of the events table arrives AFTER the stream
    * starts (live INSERTs between processAllAvailable fences), so the
    * final state provably contains post-start rows — and must equal
    * the whole events table (the oracle).
    */
  def jdbcCdcLive(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").as("val"), col("ts"))
    val root = tmpDir("graft_jdbc_cdc")
    val url = s"jdbc:derby:$root/db;create=true"
    execSql(url, "CREATE TABLE EVENTS (EVENT_ID BIGINT NOT NULL, " +
      "USER_ID BIGINT, EVENT_TYPE VARCHAR(16), VAL DOUBLE, TS TIMESTAMP)")
    // phase split respects the source's append-monotonic key
    // contract: phase-2 rows must carry keys strictly ABOVE every
    // phase-1 key (as a live auto-increment table would) — an
    // id-modulo split would hide phase-2 rows below the committed
    // offset
    val split = events.agg(percentile_approx(col("event_id"), lit(0.66),
      lit(10000))).head().getLong(0)
    // phase 1: the pre-existing snapshot (keys up to the split point)
    JdbcSink.write(events.filter(col("event_id") <= split), url,
      "APP.EVENTS", batchSize = 5000, driver = DerbyDriver,
      numPartitions = Some(4))
    val stream = spark.readStream.format("graft-jdbc")
      .option("url", url)
      .option("driver", DerbyDriver.get)
      .option("dbtable", "APP.EVENTS")
      .option("keyColumn", "EVENT_ID")
      .option("numPartitions", "4")
      .load()
    val stateDir = s"$root/state"
    val q = stream.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty)
          StreamingCdc.mergeIntoState(
            b.withColumn("op", lit("insert")), stateDir,
            pk = Seq("EVENT_ID"), orderCols = Seq("TS", "EVENT_ID"))
      }
      .start()
    try {
      q.processAllAvailable()
      // phase 2: live inserts AFTER stream start — the incremental
      // poll must pick up exactly these
      JdbcSink.write(events.filter(col("event_id") > split), url,
        "APP.EVENTS", batchSize = 5000, driver = DerbyDriver,
        numPartitions = Some(4))
      q.processAllAvailable()
    } finally q.stop()
    val template = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), stream.schema)
    StreamingCdc.currentState(spark, stateDir, template)
      .select(col("EVENT_ID").as("event_id"), col("USER_ID").as("user_id"),
        col("EVENT_TYPE").as("event_type"), col("VAL").as("value"),
        unix_micros(col("TS")).as("ts_us"))
      .orderBy("event_id")
  }

  /** q71: catalog-driven migrate, end to end through the mode
    * dispatcher — the reference's full `--create-table-sql
    * --dst-create-table --migrate-table` flow (main.py:104-148 in
    * /root/reference) driven by an INFORMATION_SCHEMA fixture:
    * prefix expansion resolves the work list against the catalog
    * (S4), the MySQL-typed catalog schemas generate DDL in both
    * dialects (D1-D4), the Spark-dialect DDL EXECUTES against the
    * session catalog (D5), the migration chain runs with count
    * reconciliation, and the migrated rows are loaded INTO the
    * DDL-created table (K1), which is what's re-read and compared —
    * a wrong type mapping, DDL shape, or work-list resolution all
    * fail the hash.
    */
  def catalogMigrate(spark: SparkSession, dir: String): DataFrame = {
    val root = tmpDir("graft_catalog_migrate")
    val csv = s"$root/catalog.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csv),
      """table_name,ordinal_position,column_name,column_type,is_nullable,column_key,column_default,extra
        |nation,1,n_nationkey,int(11),NO,PRI,,
        |nation,2,n_name,varchar(32),YES,,,
        |nation,3,n_regionkey,int(11),YES,,,
        |region,1,r_regionkey,int(11),NO,PRI,,
        |region,2,r_name,varchar(32),YES,,,
        |""".stripMargin)
    val db = s"graft_q71_${System.nanoTime()}"
    val res = graft.app.GraftApp.run(spark, graft.app.GraftApp.Config(
      srcDir = dir, dstDir = root, db = db,
      tablePrefixes = Seq("nat", "reg"),
      catalogCsv = Some(csv),
      createTableSql = true, dstCreateTable = true, migrateTable = true))
    require(res.createdTables.toSet == Set(s"$db.nation", s"$db.region"),
      s"prefix expansion + dst-create-table resolved ${res.createdTables}")
    require(res.migrations.forall(_.reconciled), "migration counts diverged")
    require(res.ddl.exists(_.contains("MergeTree")) &&
      res.ddl.exists(_.contains("USING PARQUET")),
      "create-table-sql must emit both dialects")
    // load the migrated rows INTO the DDL-created table; the catalog
    // table — not the parquet intermediate — is what gets compared
    spark.read.parquet(s"$root/nation.parquet")
      .write.insertInto(s"$db.nation")
    spark.table(s"$db.nation").orderBy("n_nationkey")
  }

  /** q69: JDBC WRITE sink round-trip — the reference's primary sink
    * direction (batched multi-row INSERTs into a live server,
    * writer/chwriter.py:47-112), against embedded Derby: orders →
    * parallel batched INSERT (JdbcSink via Migrator, with the
    * count-reconciliation protocol) → partitioned JDBC read-back,
    * which must reproduce the parquet original byte for byte.
    */
  def jdbcSinkRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val root = tmpDir("graft_jdbc_sink")
    val url = s"jdbc:derby:$root/db;create=true"
    execSql(url, "CREATE TABLE ORDERS (O_ORDERKEY BIGINT, O_CUSTKEY BIGINT, " +
      "O_ORDERSTATUS VARCHAR(4), O_TOTALPRICE DOUBLE, " +
      "O_ORDERDATE TIMESTAMP, O_ORDERPRIORITY VARCHAR(20))")
    val m = Migrator.migrateTableToJdbc(spark, dir, "orders", url,
      "APP.ORDERS", batchSize = 5000, driver = DerbyDriver,
      numPartitions = Some(4))
    require(m.reconciled,
      s"JDBC sink count mismatch: src=${m.srcRows} dst=${m.dstRows}")
    val hi = Tables.load(spark, dir, "orders")
      .agg(max(col("o_orderkey"))).head().getLong(0) + 1
    val back = JdbcSnapshot.read(spark,
      JdbcSnapshot.options(url, "APP", "ORDERS",
        partitioning = Some(JdbcSnapshot.Partitioning("O_ORDERKEY", 0L, hi, 4)),
        quote = "\"") + ("driver" -> DerbyDriver.get))
    back.select(col("O_ORDERKEY").as("o_orderkey"),
        col("O_CUSTKEY").as("o_custkey"),
        col("O_ORDERSTATUS").as("o_orderstatus"),
        col("O_TOTALPRICE").as("o_totalprice"),
        col("O_ORDERDATE").as("o_orderdate"),
        col("O_ORDERPRIORITY").as("o_orderpriority"))
      .orderBy("o_orderkey")
  }

  /** q30: snapshot migration of `lineitem` through the full chain —
    * column skip + WHERE + auto-DDL + count reconciliation — then
    * the migrated table's contents (which the oracle checks against
    * the equivalent SELECT over the source).
    */
  def migrateCounts(spark: SparkSession, dir: String): DataFrame = {
    val dst = tmpDir("graft_migrate")
    val spec = Migrator.Spec(
      skipColumns = Map("lineitem" -> Seq("l_tax")),
      whereClauses = Map("lineitem" ->
        "l_shipdate >= timestamp'1998-01-01 00:00:00'"))
    val m = Migrator.migrateTable(spark, dir, dst, "lineitem", spec = spec)
    require(m.reconciled,
      s"count reconciliation failed: src=${m.srcRows} dst=${m.dstRows}")
    spark.read.parquet(s"$dst/lineitem.parquet")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** q74: migration with a REGISTERED converter plugin (X1 — the
    * reference's `--column-convert`/custom-converter surface,
    * converter/ in /root/reference): a per-table transform hooked
    * into the migrate chain rewrites columns mid-flight
    * (upper-cased name, account balance re-expressed in cents), and
    * the migrated table — read back from disk — must equal the
    * oracle's SQL formulation of the same conversion.
    */
  def convertedMigrate(spark: SparkSession, dir: String): DataFrame = {
    val dst = tmpDir("graft_convert")
    val reg = new graft.ops.Transforms.TransformRegistry()
      .register("supplier", df => df
        .withColumn("s_name", upper(col("s_name")))
        .withColumn("s_acctbal_cents",
          round(col("s_acctbal") * 100).cast("long"))
        .drop("s_acctbal"))
    val m = Migrator.migrateTable(spark, dir, dst, "supplier",
      spec = Migrator.Spec(transforms = reg))
    require(m.reconciled,
      s"count reconciliation failed: src=${m.srcRows} dst=${m.dstRows}")
    spark.read.parquet(s"$dst/supplier.parquet").orderBy("s_suppkey")
  }

  /** q151: re-migration after source schema drift — the reference's
    * loudest self-declared gap ("DDL changes are not supported",
    * docs/manual.md:261-262; freeze_schema mysqlreader.py:130 in
    * /root/reference) closed end to end. Migration 1 snapshots the
    * lower half of `supplier` under the original schema; the source
    * then "ALTERs" (a converter adds `s_tier` and widens
    * `s_nationkey` int → bigint — the additive evolution lattice);
    * remigrate detects exactly that drift, evolves the managed table
    * (retained rows: NULL tier, widened nationkey), and PK-merges an
    * OVERLAPPING second scope (incoming rows replace same-key
    * retained rows). The merged managed table is what the oracle
    * recomputes from the raw source.
    */
  def remigrateDrift(spark: SparkSession, dir: String): DataFrame = {
    val dst = tmpDir("graft_remigrate")
    val supplier = Tables.load(spark, dir, "supplier")
    val half = supplier.agg(max(col("s_suppkey"))).head().getLong(0) / 2
    val m1 = Migrator.migrateTable(spark, dir, dst, "supplier",
      spec = Migrator.Spec(whereClauses =
        Map("supplier" -> s"s_suppkey <= $half")))
    require(m1.reconciled, s"initial migration: src=${m1.srcRows} dst=${m1.dstRows}")
    // the drifted source: ALTER TABLE supplier ADD COLUMN s_tier INT,
    // MODIFY s_nationkey BIGINT — simulated by a registered converter
    // on the re-migration scope, which overlaps the first by 5 keys
    val drifted = new graft.ops.Transforms.TransformRegistry()
      .register("supplier", df => df
        .withColumn("s_nationkey", col("s_nationkey").cast("bigint"))
        .withColumn("s_tier", (col("s_suppkey") % 5).cast("int")))
    val r = Migrator.remigrate(spark, dir, dst, "supplier",
      pk = Seq("s_suppkey"),
      spec = Migrator.Spec(
        whereClauses = Map("supplier" -> s"s_suppkey >= ${half - 4}"),
        transforms = drifted))
    require(r.addedColumns == Seq("s_tier") &&
      r.widenedColumns == Seq("s_nationkey"),
      s"drift detection: added=${r.addedColumns} widened=${r.widenedColumns}")
    require(r.reconciled,
      s"remigrate counts: retained=${r.retainedRows} " +
        s"incoming=${r.incomingRows} dst=${r.dstRows}")
    spark.read.parquet(s"$dst/supplier.parquet").orderBy("s_suppkey")
  }

  /** q31: CSV sink → source round-trip of `customer` (sorted header
    * layout, '' ↔ NULL, typed read-back via explicit schema).
    */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.load(spark, dir, "customer")
    val path = tmpDir("graft_csv")
    CsvSource.write(src, path)
    val sortedSchema = StructType(src.schema.fields.sortBy(_.name))
    CsvSource.read(spark, path, Some(sortedSchema)).orderBy("c_custkey")
  }

  /** q61: JSON-lines source/sink roundtrip (SURVEY §2.1/§2.2 —
    * the batch face of the CDC envelope format): orders written as
    * sorted-column JSON lines, read back with the explicit schema
    * (typed single-pass scan — no inference pass), must equal the
    * parquet original. Null handling differs from CSV: JSON omits
    * null fields instead of writing '', so the roundtrip is
    * type-faithful without the ''→NULL convention.
    */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.load(spark, dir, "orders")
    val path = tmpDir("graft_json")
    JsonSource.write(src, path)
    val sortedSchema = StructType(src.schema.fields.sortBy(_.name))
    JsonSource.read(spark, path, Some(sortedSchema)).orderBy("o_orderkey")
  }

  /** q73: ORC sink → source round-trip of `lineitem` (the widest
    * fact table: int/long/double/string/timestamp columns, bloom
    * indexes on the join keys) must be value-identical to the
    * parquet original.
    */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.load(spark, dir, "lineitem")
    val path = tmpDir("graft_orc")
    OrcSource.write(src, path, bloomFor = Seq("l_orderkey", "l_partkey"))
    val sortedSchema = StructType(src.schema.fields.sortBy(_.name))
    OrcSource.read(spark, path, Some(sortedSchema))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** q147: XML sink → source round-trip of `orders` (long/int/
    * double/string/timestamp columns through the text format) must
    * be value-identical to the parquet original. Doubles survive
    * because Java's shortest-representation `Double.toString` /
    * `parseDouble` pair is round-trip exact; timestamps ride the
    * explicit microsecond ISO format pinned in XmlSource.
    */
  def xmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.load(spark, dir, "orders")
    val path = tmpDir("graft_xml")
    XmlSource.write(src, path)
    val sortedSchema = StructType(src.schema.fields.sortBy(_.name))
    XmlSource.read(spark, path, Some(sortedSchema)).orderBy("o_orderkey")
  }

  /** q32: CDC final state through the STREAMING path — the change
    * feed replayed via readStream + foreachBatch merge into the
    * versioned state store (StreamingCdc), drained with
    * Trigger.AvailableNow. Must equal q17's batch answer — the same
    * oracle checks both.
    */
  def cdcStreamState(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val feed = ChangeFeed.fromEvents(events)
    val root = tmpDir("graft_cdc_stream")
    val feedDir = s"$root/feed"
    val stateDir = s"$root/state"
    feed.write.mode("overwrite").parquet(feedDir)
    val stream = spark.readStream.schema(feed.schema).parquet(feedDir)
    StreamingCdc.start(stream, stateDir, s"$root/checkpoint",
      pk = Seq("user_id"), orderCols = Seq("ts", "event_id"))
      .awaitTermination()
    StreamingCdc.currentState(spark, stateDir,
      template = feed.drop("op"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** q43: exact dedup maintained INCREMENTALLY from a stream — the
    * documents corpus arrives in micro-batches (multi-file source,
    * one file per trigger) and IncrementalAgg folds per-batch
    * partials (count, min) into the bucketed state store with
    * sum/min merges. Must equal the batch q23 answer — the same
    * oracle shape checks both; proves a maintained rollup needs no
    * history recompute.
    */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.IncrementalAgg
    val docs = Tables.load(spark, dir, "documents")
      .select(md5(col("text")).as("content_hash"), col("doc_id"))
    val root = tmpDir("graft_stream_dedup")
    // several files → several micro-batches → real cross-batch merges
    docs.repartition(8).write.mode("overwrite").parquet(s"$root/feed")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 2).parquet(s"$root/feed")
    val keys = Seq("content_hash")
    val batchAgg = Seq(count(lit(1)).as("n_copies"),
      min(col("doc_id")).as("keeper_doc_id"))
    val mergeAgg = Seq(sum(col("n_copies")).as("n_copies"),
      min(col("keeper_doc_id")).as("keeper_doc_id"))
    IncrementalAgg.start(stream, s"$root/state", s"$root/ckpt",
      keys, batchAgg, mergeAgg).awaitTermination()
    val template = docs.groupBy("content_hash").agg(batchAgg.head, batchAgg.tail: _*)
    IncrementalAgg.current(spark, s"$root/state", template)
      .orderBy("content_hash")
  }

  /** q51: stream–static enrichment join — the CDC-adjacent pattern
    * of joining a live event stream against slowly-changing
    * dimensions. The static side (customer ⋈ nation, pre-joined and
    * broadcast) never re-reads per micro-batch shuffle; the stream
    * side joins map-side. Complete-mode count/sum per nation must
    * equal the batch formulation — one oracle checks both.
    */
  def streamStaticEnrich(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val dim = Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val root = tmpDir("graft_stream_enrich")
    events.write.mode("overwrite").parquet(s"$root/events")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 4).parquet(s"$root/events")
    val name = s"graft_enrich_${streamCounter.incrementAndGet()}"
    val q = stream
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double")
          .as("total_value"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("n_name")
  }

  private val streamCounter = new AtomicInteger(0)

  /** q39: session windows through Structured Streaming —
    * `session_window(ts, gap)` + watermark in append mode (the only
    * mode session windows support). Append emits a session only
    * once the watermark passes it, and the watermark never exceeds
    * the max observed event time — so the feed carries a sentinel
    * event two hours past the real maximum, advancing the watermark
    * beyond every real session. The sentinel is keyed by a NULL
    * user_id — a value outside every legitimate key domain (unlike a
    * magic -1, which would silently swallow real negative ids) — so
    * it forms its own null-key session group, filtered out
    * explicitly. Must agree with the batch gap-sessionization rule
    * (oracle: lag/cumsum sessions; session start = min event ts).
    */
  def streamSessions(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val root = tmpDir("graft_stream_sess")
    val maxTs = Option(events.agg(max(col("ts"))).head().getTimestamp(0))
    val sentinel = maxTs.fold(events.limit(0)) { m =>
      val flushTs = new java.sql.Timestamp(m.getTime + 2L * 3600 * 1000)
      events.limit(1).select(events.columns.map {
        case "user_id" => lit(null).cast("long").as("user_id")
        case "ts"      => lit(flushTs).as("ts")
        case c         => col(c)
      }: _*)
    }
    events.unionByName(sentinel).write.mode("overwrite")
      .parquet(s"$root/events")
    val stream = spark.readStream.schema(events.schema)
      .parquet(s"$root/events")
    val name = s"graft_sessions_${streamCounter.incrementAndGet()}"
    val q = stream
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n_events"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).filter(col("user_id").isNotNull)
      .orderBy("user_id", "session_start")
  }

  /** q33: event-time hourly aggregation through Structured Streaming
    * — `withWatermark` + `window` (SURVEY §2.10 T5), drained with
    * AvailableNow into a memory sink in complete mode. Must equal
    * the batch q16 answer — the same oracle checks both.
    */
  def streamHourlyAgg(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val root = tmpDir("graft_stream_agg")
    events.write.mode("overwrite").parquet(s"$root/events")
    val stream = spark.readStream.schema(events.schema)
      .parquet(s"$root/events")
    val name = s"graft_hourly_${streamCounter.incrementAndGet()}"
    val q = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double")
          .as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total_value"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("hour", "event_type")
  }

  /** q59: stream-stream inner join (SURVEY §2.10 — beyond the
    * reference's processing-time-only model): purchases join clicks
    * of the same user within the preceding 10 minutes. Watermarks on
    * BOTH inputs plus the two-sided time-range predicate are what
    * let Spark bound the join state — each side's buffered rows are
    * evicted once the other side's watermark passes the range, so
    * state stays O(window), not O(stream), at any scale. Inner-join
    * results emit as matches arrive (append mode); the drained pairs
    * are then batch-aggregated per user and must equal the
    * equivalent batch self-join (the oracle).
    */
  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val root = tmpDir("graft_ss_join")
    events.write.mode("overwrite").parquet(s"$root/events")
    def side(tpe: String) = spark.readStream.schema(events.schema)
      .parquet(s"$root/events").filter(col("event_type") === tpe)
    val clicks = side("click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = side("purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "1 hour")
    val name = s"graft_ssjoin_${streamCounter.incrementAndGet()}"
    val q = purchases.join(clicks,
        col("user_id") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 10 MINUTES") &&
        col("click_ts") <= col("purchase_ts"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("purchase_id")).as("n_purchases"))
      .orderBy(col("user_id"))
  }

  /** q94: gap sessionization through ARBITRARY keyed state
    * (`flatMapGroupsWithState`, StatefulSessions) — the custom-state
    * face of SURVEY §2.10, deliberately computing the same sessions
    * as the session_window path (q39) and the batch oracle, so user
    * code in the state transition is held to the same hash gate.
    *
    * The feed arrives as FIVE time-ordered chunks drained one per
    * micro-batch (maxFilesPerTrigger=1): three event-range files —
    * sessions spanning a cut prove cross-batch state carry-over —
    * and two late sentinel files whose only job is to push the
    * watermark past every real session's gap edge, so the final
    * flush happens through event-time TIMEOUTS, not stream end.
    */
  def streamCustomStateSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"))
    val root = tmpDir("graft_stream_custom")
    val b = events.agg(min(col("ts")), max(col("ts"))).head()
    val (mn, mx) = (b.getTimestamp(0), b.getTimestamp(1))
    val span = mx.getTime - mn.getTime
    val cut1 = new java.sql.Timestamp(mn.getTime + span / 3)
    val cut2 = new java.sql.Timestamp(mn.getTime + 2 * span / 3)
    val chunks = Seq(
      events.filter(col("ts") <= lit(cut1)),
      events.filter(col("ts") > lit(cut1) && col("ts") <= lit(cut2)),
      events.filter(col("ts") > lit(cut2))) ++
      Seq(2L, 4L).map { h =>
        events.limit(1).select(lit(null).cast("long").as("user_id"),
          lit(new java.sql.Timestamp(mx.getTime + h * 3600 * 1000)).as("ts"))
      }
    chunks.zipWithIndex.foreach { case (df, i) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$root/c$i")
      Thread.sleep(15) // distinct mtimes pin the file source's order
    }
    val stream = spark.readStream.schema(
        StructType(events.schema.fields))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/*")
    val sessions = graft.streaming.StatefulSessions.sessionize(
      stream.withWatermark("ts", "0 seconds")
        .as[(Option[Long], java.sql.Timestamp)],
      gapMicros = 1800000000L)
    val name = s"graft_custom_sessions_${streamCounter.incrementAndGet()}"
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select(col("user_id"),
        date_format(timestamp_micros(col("start_micros")),
          "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** q140: streaming exact dedup under redelivery —
    * `dropDuplicatesWithinWatermark` on the event key over a feed
    * that delivers EVERY event twice (the at-least-once delivery
    * every CDC/queue source exhibits; the reference's binlog tail
    * re-reads on reconnect, mysqlreader.py:356-448 in
    * /root/reference). The watermark bounds the dedup state (keys
    * older than the watermark are evicted — at-least-once sources
    * redeliver within a bounded lag), where a batch `distinct` would
    * hold every key forever — and where q43's maintained rollup
    * AGGREGATES duplicates, this DROPS them pre-aggregation. The
    * post-dedup per-type counts must equal the batch counts over the
    * un-duplicated table — the streaming ≡ batch contract of the
    * q33/q39 family.
    */
  def streamRedeliveryDedup(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val root = tmpDir("graft_stream_dedup")
    // redelivery: two full copies of the feed
    events.write.mode("overwrite").parquet(s"$root/in")
    events.write.mode("append").parquet(s"$root/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$root/in")
    val name = s"graft_dedup_${streamCounter.incrementAndGet()}"
    val q = stream
      // the delay must exceed the fixture's whole event-time span:
      // should the file source split the feed across micro-batches,
      // a narrower watermark would evict old keys before their
      // redelivered copies arrive and the copies would slip through
      // (the production contract is delay > max redelivery lag; the
      // fixture's "lag" is the full span, so the test pins that)
      .withWatermark("ts", "8760 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("event_id")).as("n_ids"))
      .orderBy("event_type")
  }

  /** q154: INCREMENTAL corpus n-gram novelty — q150 as a stream.
    * Documents arrive as files; a streaming aggregate maintains each
    * shingle's first-occurrence doc (`min(doc_id)` — commutative, so
    * the drained answer is arrival-order-free and must hash-equal
    * batch [[graft.dedup.Dedup.ngramNovelty]]; q150's oracle checks
    * both). The streaming state IS the seen-shingle dictionary —
    * exactly what a crawl-saturation monitor keeps between snapshots
    * (RocksDB-state-sized at corpus scale, the same cardinality the
    * batch op shuffles); per-doc gram totals are per-file facts and
    * ride the batch side. Complete-mode memory sink here because the
    * gate drains to termination — this face is the ORACLE HARNESS;
    * the PRODUCTION face is [[graft.streaming.CurationPumps
    * .startNoveltyPump]], which persists the same dictionary through
    * BucketStateStore via foreachBatch and survives crash-restarts.
    */
  def streamNovelty(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val root = tmpDir("graft_stream_novelty")
    // two files, upper half written first: arrival order must not
    // matter because min() is commutative
    docs.filter(col("doc_id") % 2 === 1).write.parquet(s"$root/docs")
    docs.filter(col("doc_id") % 2 === 0).write.mode("append")
      .parquet(s"$root/docs")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/docs")
    val name = s"graft_novelty_${streamCounter.incrementAndGet()}"
    val q = stream
      .select(col("doc_id"),
        explode(array_distinct(
          graft.text.TextAnalysis.shingles(col("text"), 3))).as("shingle"))
      .groupBy(col("shingle"))
      .agg(min(col("doc_id")).as("first_doc"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val novel = spark.table(name)
      .groupBy(col("first_doc")).agg(count(lit(1)).as("nov"))
    // documents shorter than k tokens have NO shingles and NO row in
    // batch ngramNovelty (explode of an empty array); drop them here
    // too so stream and batch are row-identical on every valid corpus
    val perDoc = docs.select(col("doc_id"),
        size(array_distinct(
          graft.text.TextAnalysis.shingles(col("text"), 3))).as("n_grams"))
      .filter(col("n_grams") > 0)
    perDoc.join(novel, col("doc_id") === col("first_doc"), "left")
      .select(col("doc_id"), col("n_grams").cast("long").as("n_grams"),
        coalesce(col("nov"), lit(0L)).as("novel"),
        (coalesce(col("nov"), lit(0L)).cast("double") /
          col("n_grams").cast("double")).as("novelty"))
      .orderBy("doc_id")
  }

  /** q155: decontamination ON INGEST — q48's benchmark contamination
    * scan as a stream-static join. The probe shingle set is batch
    * (benchmark-sized, broadcast, built once); corpus documents
    * arrive as files and each is graded in the micro-batch that
    * carries it — the production shape, where contaminated documents
    * are flagged before they ever land in the training store rather
    * than by a later full-corpus sweep. Counts are per-doc facts of
    * the arriving document (distinct shingles ∩ probe set), so the
    * drained answer equals batch [[graft.dedup.Dedup.contaminationScan]]
    * on the same split — q48's oracle checks both. This memory-sink
    * face is the ORACLE HARNESS; the PRODUCTION face is
    * [[graft.streaming.CurationPumps.startContaminationPump]], which
    * persists the verdicts through BucketStateStore and survives
    * crash-restarts.
    */
  def streamContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val probes = docs.filter(col("doc_id") % 100 === 0)
    val corpus = docs.filter(col("doc_id") % 100 =!= 0)
    val root = tmpDir("graft_stream_contam")
    corpus.write.parquet(s"$root/docs")
    val probeShingles = graft.dedup.Dedup
      .shingleRows(probes, 3, "doc_id", "text")
      .select("shingle").distinct()
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/docs")
    val name = s"graft_contam_${streamCounter.incrementAndGet()}"
    val q = stream
      .select(col("doc_id"),
        explode(array_distinct(
          graft.text.TextAnalysis.shingles(col("text"), 3))).as("shingle"))
      .join(broadcast(probeShingles), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("doc_id")
  }

  /** q162: labeler grading ON INGEST — q153's classifier report as a
    * stream. Documents arrive as files; each micro-batch's
    * (gold, predicted) confusion cells fold ADDITIVELY into the
    * durable census through the PRODUCTION pump
    * ([[graft.streaming.CurationPumps.startAgreementPump]] —
    * BucketStateStore + batch-id fence; unlike q154/q155 this face
    * drives the production path directly, there is no memory-sink
    * intermediary), and the report reads the persisted state. Counts
    * are commutative, so the drained report must hash-equal batch
    * [[graft.ops.Agreement.classifierReport]] — q153's oracle checks
    * both. The production stance: a labeler's live agreement with
    * gold is readable at any time without re-scanning the corpus,
    * and the census survives the pump.
    */
  def streamAgreement(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val root = tmpDir("graft_stream_agree")
    // two files, upper half first: additive counts are arrival-order-free
    docs.filter(col("doc_id") % 2 === 1).write.parquet(s"$root/docs")
    docs.filter(col("doc_id") % 2 === 0).write.mode("append")
      .parquet(s"$root/docs")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/docs")
    graft.streaming.CurationPumps.startAgreementPump(
        stream, s"$root/state", s"$root/ckpt",
        gold = col("lang"),
        pred = graft.text.TextAnalysis.langId(col("text"),
          graft.text.TextAnalysis.defaultProfiles))
      .awaitTermination()
    graft.streaming.CurationPumps.agreementReport(spark, s"$root/state")
  }

  /** q176: the PRODUCTION score pump drained over the documents
    * table and graded against q165's batch oracle VERBATIM — the
    * drain-equals-batch contract for the threshold-free score grade:
    * per-score (pos, neg) counts are additive and commutative, so
    * the durable census a resident `--score-pump` maintains must
    * yield bit-identical ROC-AUC to the batch scan, in any arrival
    * order (the two feed files land upper half first). The streaming
    * face of the ScoreEval family, q162's precedent applied to score
    * censuses.
    */
  def streamScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val root = tmpDir("graft_stream_score")
    docs.filter(col("doc_id") % 2 === 1).write.parquet(s"$root/docs")
    docs.filter(col("doc_id") % 2 === 0).write.mode("append")
      .parquet(s"$root/docs")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/docs")
    graft.streaming.CurationPumps.startScorePump(
        stream, s"$root/state", s"$root/ckpt",
        score = size(filter(graft.text.TextAnalysis.tokens(col("text")),
          t => t === "the" || t === "a")),
        label = when(col("lang") === "en", lit(1L)).otherwise(lit(0L)))
      .awaitTermination()
    graft.streaming.CurationPumps.scoreAuc(spark, s"$root/state")
  }

  /** q179: the PRODUCTION drift pump drained over the documents
    * table and graded against q173's batch oracle VERBATIM — the
    * drain-equals-batch contract for the KS drift gauge: the
    * two-population census is additive, so the durable state a
    * resident `--drift-pump` maintains must yield a bit-identical
    * sup-CDF gap to the batch scan, in any arrival order.
    */
  def streamDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"), col("source"))
    val root = tmpDir("graft_stream_drift")
    docs.filter(col("doc_id") % 2 === 1).write.parquet(s"$root/docs")
    docs.filter(col("doc_id") % 2 === 0).write.mode("append")
      .parquet(s"$root/docs")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/docs")
    graft.streaming.CurationPumps.startDriftPump(
        stream, s"$root/state", s"$root/ckpt",
        score = col("n_chars"),
        group = when(col("source") === "src0", lit(1L)).otherwise(lit(0L)))
      .awaitTermination()
    graft.streaming.CurationPumps.driftKs(spark, s"$root/state")
  }

  // ------------------------------------------------------------------
  // q180-q185: the UNIFIED monitor — one resident stream whose single
  // foreachBatch folds EVERY census from one pass over each arriving
  // file (where q154/q155/q162/q176/q179 each run their own reader).
  // The six faces below read the per-leg durable state of ONE shared
  // monitor drain — deliberately memoized per source dir, because the
  // whole point of the monitor is that the six censuses cost one
  // ingest pass, not six; each query entry still grades its census
  // against its batch oracle VERBATIM (the q154/q155/q153/q165/q173/
  // q172 SQL, unchanged).
  // ------------------------------------------------------------------

  private val monitorRoots = scala.collection.mutable.Map[String, String]()

  /** The memo key is the source dir PLUS a content fingerprint of its
    * documents table (file listing with sizes and mtimes): if the
    * fixture under `dir` changes between invocations, the monitor is
    * re-drained instead of grading stale state against a
    * freshly-computed oracle.
    */
  private def docsFingerprint(dir: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val root = new java.io.File(graft.Tables.path(dir, "documents"))
    val sig = walk(root)
      .map(f => s"${f.getPath}:${f.length}:${f.lastModified}")
      .mkString("\n")
    java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(sig))
  }

  private def monitorStateRoot(spark: SparkSession, dir: String): String =
    monitorRoots.synchronized {
      monitorRoots.getOrElseUpdate(s"$dir@${docsFingerprint(dir)}", {
        import graft.streaming.CurationPumps
        val full = Tables.load(spark, dir, "documents")
        val root = tmpDir("graft_monitor")
        // two files, upper half first: every leg's census is
        // arrival-order-free (additive or idempotent merges)
        full.filter(col("doc_id") % 2 === 1).write.parquet(s"$root/docs")
        full.filter(col("doc_id") % 2 === 0).write.mode("append")
          .parquet(s"$root/docs")
        val stream = spark.readStream.schema(full.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$root/docs")
        // the q155 split: benchmark probes are the %100 slice, graded
        // against the REST of the corpus — the contamination leg
        // filters its own view of the shared batch (a leg is a fold,
        // not a second reader)
        val probes = full.select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 100 === 0)
        val probeShingles = graft.dedup.Dedup
          .shingleRows(probes, 3, "doc_id", "text")
          .select("shingle").distinct().localCheckpoint()
        val nb = graft.streaming.BucketStateStore.DefaultNumBuckets
        val legs = Seq(
          CurationPumps.noveltyLeg(s"$root/state/novelty", k = 3),
          CurationPumps.MonitorLeg("contamination",
            s"$root/state/contamination", (b, bid) =>
            CurationPumps.mergeContaminationBatch(
              b.filter(col("doc_id") % 100 =!= 0), probeShingles,
              s"$root/state/contamination", 3, "doc_id", "text", nb, bid)),
          CurationPumps.agreementLeg(s"$root/state/agreement",
            gold = col("lang"),
            pred = graft.text.TextAnalysis.langId(col("text"),
              graft.text.TextAnalysis.defaultProfiles)),
          CurationPumps.scoreLeg(s"$root/state/score",
            score = size(filter(graft.text.TextAnalysis.tokens(col("text")),
              t => t === "the" || t === "a")),
            label = when(col("lang") === "en", lit(1L)).otherwise(lit(0L))),
          CurationPumps.driftLeg(s"$root/state/drift",
            score = col("n_chars"),
            group = when(col("source") === "src0", lit(1L))
              .otherwise(lit(0L))),
          CurationPumps.jsdLeg(s"$root/state/jsd",
            group = col("source"), text = col("text")),
          CurationPumps.ksMatrixLeg(s"$root/state/ksmatrix",
            score = col("n_chars"), group = col("source")),
          CurationPumps.classesLeg(s"$root/state/classes",
            confMilliByClass = PipelineQueries.mc3Conf,
            gold = PipelineQueries.mc3Gold))
        CurationPumps.startMonitorPump(stream, s"$root/ckpt", legs)
          .awaitTermination()
        root
      })
    }

  /** q180: the monitor's novelty leg — the durable dictionary ONE
    * shared reader folded must equal batch ngramNovelty (q154's
    * oracle verbatim).
    */
  def monitorNovelty(spark: SparkSession, dir: String): DataFrame = {
    val root = monitorStateRoot(spark, dir)
    graft.streaming.CurationPumps.noveltyReport(spark,
      s"$root/state/novelty",
      Tables.load(spark, dir, "documents").select(col("doc_id"), col("text")),
      k = 3)
  }

  /** q181: the monitor's contamination leg (q155's oracle verbatim). */
  def monitorContamination(spark: SparkSession, dir: String): DataFrame = {
    val root = monitorStateRoot(spark, dir)
    graft.streaming.CurationPumps.contaminationVerdicts(spark,
      s"$root/state/contamination")
  }

  /** q182: the monitor's agreement leg (q153's oracle verbatim). */
  def monitorAgreement(spark: SparkSession, dir: String): DataFrame = {
    val root = monitorStateRoot(spark, dir)
    graft.streaming.CurationPumps.agreementReport(spark,
      s"$root/state/agreement")
  }

  /** q183: the monitor's score leg (q165's oracle verbatim). */
  def monitorScore(spark: SparkSession, dir: String): DataFrame = {
    val root = monitorStateRoot(spark, dir)
    graft.streaming.CurationPumps.scoreAuc(spark, s"$root/state/score")
  }

  /** q184: the monitor's drift leg (q173's oracle verbatim). */
  def monitorDrift(spark: SparkSession, dir: String): DataFrame = {
    val root = monitorStateRoot(spark, dir)
    graft.streaming.CurationPumps.driftKs(spark, s"$root/state/drift")
  }

  /** q185: the monitor's token-JSD leg — the drift-triad member that
    * was batch-only (q172's oracle verbatim): the (group, token)
    * census is additive, so the durable state a resident monitor
    * maintains must yield the bit-identical source-vs-mixture JSD.
    */
  def monitorJsd(spark: SparkSession, dir: String): DataFrame = {
    val root = monitorStateRoot(spark, dir)
    graft.streaming.CurationPumps.jsdReport(spark, s"$root/state/jsd")
  }

  /** q192: the monitor's every-source-vs-rest KS drift-matrix leg —
    * the (grp, s) census is additive, so the durable state a
    * resident monitor maintains must yield a bit-identical matrix
    * (q189's oracle verbatim). Where q184 needed src0 nominated in
    * advance, this leg grades every source.
    */
  def monitorKsMatrix(spark: SparkSession, dir: String): DataFrame = {
    val root = monitorStateRoot(spark, dir)
    graft.streaming.CurationPumps.ksMatrixReport(spark,
      s"$root/state/ksmatrix")
  }

  /** q193: vocabulary coverage as a second FACE of the monitor's
    * token-JSD state — the (grp, tok, c) census the JSD leg already
    * maintains is exactly vocabCoverage's input, so the saturation
    * report costs a resident deployment NO new leg and no new state
    * (q175's oracle verbatim).
    */
  def monitorVocab(spark: SparkSession, dir: String): DataFrame = {
    val root = monitorStateRoot(spark, dir)
    graft.streaming.CurationPumps.vocabCoverageReport(spark,
      s"$root/state/jsd")
  }

  /** q197: the monitor's multiclass router-audit leg — the
    * (cls, s, pos, neg) census of the q188 confidence vector is
    * additive, so the durable state a resident monitor maintains
    * must yield bit-identical per-class ROC-AUC (q195's oracle
    * verbatim). Completes the resident battery: every score-eval
    * family the batch side grades now has a drained twin.
    */
  def monitorClassAuc(spark: SparkSession, dir: String): DataFrame = {
    val root = monitorStateRoot(spark, dir)
    graft.streaming.CurationPumps.classAucReport(spark,
      s"$root/state/classes")
  }

  /** q186: the resident face of q177 — per-(grp, dim) component sums
    * are exact longs, additive and commutative, folded through
    * BucketStateStore like the score census; the drained centroid-
    * vs-rest cosine must equal the batch scan bit-for-bit (q177's
    * oracle verbatim). Embeddings ride their own feed (a different
    * table than the document monitor).
    */
  def streamEmbeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val embs = Tables.load(spark, dir, "embeddings")
    val root = tmpDir("graft_stream_embdrift")
    embs.filter(col("vec_id") % 2 === 1).write.parquet(s"$root/docs")
    embs.filter(col("vec_id") % 2 === 0).write.mode("append")
      .parquet(s"$root/docs")
    val stream = spark.readStream.schema(embs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/docs")
    graft.streaming.CurationPumps.startMonitorPump(stream, s"$root/ckpt",
        Seq(graft.streaming.CurationPumps.embeddingDriftLeg(s"$root/state")))
      .awaitTermination()
    graft.streaming.CurationPumps.embeddingDriftReport(spark, s"$root/state")
  }
}
