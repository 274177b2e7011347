package graft

import graft.cdc.CdcApplier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** CdcApplier batch semantics, in particular the PK-changing UPDATE
  * case from SURVEY §7.3's risk register: the reference applies
  * UPDATEs keyed on the after-image PK only (mysqlreader.py:322 in
  * /root/reference), so an update that moves a row to a new key
  * leaves the stale old-key row behind. When the envelope carries
  * before-image key columns, graft expands the move into
  * delete(before) + insert(after).
  */
class CdcApplierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val pk = Seq("user_id")
  private val orderCols = Seq(col("ts"), col("event_id"))

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("PK-changing update becomes delete(before) + insert(after)") {
    val state = Seq((1L, "alice", ts(0)), (2L, "bob", ts(0)))
      .toDF("user_id", "name", "ts").withColumn("event_id", lit(0L))
    // user 1 is re-keyed to 7 — the merge keyed on after-PK alone
    // would upsert key 7 and leave the stale key-1 row in place
    val batch = Seq((7L, Some(1L), "alice2", ts(1), 1L, "update"))
      .toDF("user_id", "_before_user_id", "name", "ts", "event_id", "op")
    val out = CdcApplier.applyBatch(state, batch, pk, orderCols)
      .select("user_id", "name").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((2L, "bob"), (7L, "alice2")),
      "old key 1 must be deleted, new key 7 inserted")
  }

  test("update with unchanged before-PK is a plain upsert") {
    val state = Seq((1L, "alice", ts(0)), (2L, "bob", ts(0)))
      .toDF("user_id", "name", "ts").withColumn("event_id", lit(0L))
    val batch = Seq(
      (1L, Some(1L), "alice2", ts(1), 1L, "update"),   // same-key update
      (3L, None: Option[Long], "carol", ts(1), 2L, "insert"))
      .toDF("user_id", "_before_user_id", "name", "ts", "event_id", "op")
    val out = CdcApplier.applyBatch(state, batch, pk, orderCols)
      .select("user_id", "name").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "alice2"), (2L, "bob"), (3L, "carol")))
  }

  test("batches without before-image columns pass through unchanged") {
    val state = Seq((1L, "alice", ts(0))).toDF("user_id", "name", "ts")
      .withColumn("event_id", lit(0L))
    val batch = Seq((1L, "alice2", ts(1), 1L, "update"))
      .toDF("user_id", "name", "ts", "event_id", "op")
    val out = CdcApplier.applyBatch(state, batch, pk, orderCols)
      .select("user_id", "name").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "alice2")))
  }

  test("partial before-image key columns are an error") {
    val batch = Seq((1L, "x", "update")).toDF("user_id", "name", "op")
      .withColumn("_before_user_id", lit(1L))
    // two-column PK but only one before column present
    intercept[IllegalArgumentException] {
      CdcApplier.normalizePkChanges(batch, Seq("user_id", "name"))
    }
  }

  test("streaming merge expands a PK move and keeps _before_ out of state") {
    val root = java.nio.file.Files.createTempDirectory("graft_pkmove").toString
    val b1 = Seq(
      (1L, None: Option[Long], "a", ts(0), 0L, "insert"),
      (2L, None: Option[Long], "b", ts(0), 1L, "insert"))
      .toDF("user_id", "_before_user_id", "name", "ts", "event_id", "op")
    val b2 = Seq((7L, Some(1L), "a2", ts(1), 2L, "update"))
      .toDF("user_id", "_before_user_id", "name", "ts", "event_id", "op")
    graft.streaming.StreamingCdc.mergeIntoState(b1, s"$root/state", pk,
      Seq("ts", "event_id"))
    graft.streaming.StreamingCdc.mergeIntoState(b2, s"$root/state", pk,
      Seq("ts", "event_id"))
    val template = b1.drop("op", "_before_user_id")
    val st = graft.streaming.StreamingCdc.currentState(spark, s"$root/state", template)
    assert(!st.columns.contains("_before_user_id"),
      "transient before-image columns must not persist in state")
    val keys = st.select("user_id", "name").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(keys.toSeq == Seq((2L, "b"), (7L, "a2")))
  }

  test("replayCompact applies a key move inside a whole-feed replay") {
    // insert 1, then move 1→7, then insert a fresh 1: final state has
    // both 7 (the moved row) and the new 1
    val feed = Seq(
      (1L, None: Option[Long], "a", ts(0), 0L, "insert"),
      (7L, Some(1L), "a2", ts(1), 1L, "update"),
      (1L, None: Option[Long], "fresh", ts(2), 2L, "insert"))
      .toDF("user_id", "_before_user_id", "name", "ts", "event_id", "op")
    val out = CdcApplier.replayCompact(feed, pk, orderCols)
      .select("user_id", "name").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "fresh"), (7L, "a2")))
  }
}

/** Shared test serializer: the fixture feed rendered as Debezium
  * JSON envelopes — c/u/d op letters, before/after images per op,
  * binlog order carried as (source.ts_ms = unix_micros(ts),
  * source.pos = event_id) so the parsed ordering is exactly the
  * feed's (ts, event_id) ordering.
  */
object DebeziumTestFeed {
  import org.apache.spark.sql.functions._

  def toDebeziumJson(f: org.apache.spark.sql.DataFrame,
      rowSchema: org.apache.spark.sql.types.StructType,
      wrapped: Boolean, db: String = "graft",
      table: String = "events"): org.apache.spark.sql.DataFrame = {
    val row = struct(rowSchema.fieldNames.map(col).toIndexedSeq: _*)
    val nullRow = lit(null).cast(rowSchema)
    val payload = struct(
      when(col("op") =!= "insert", row).otherwise(nullRow).as("before"),
      when(col("op") =!= "delete", row).otherwise(nullRow).as("after"),
      struct(lit(db).as("db"), lit(table).as("table"),
        unix_micros(col("ts")).as("ts_ms"), lit("binlog.000001").as("file"),
        col("event_id").as("pos")).as("source"),
      when(col("op") === "insert", "c").when(col("op") === "update", "u")
        .otherwise("d").as("op"),
      unix_micros(col("ts")).as("ts_ms"))
    val env = if (wrapped) struct(payload.as("payload")) else payload
    f.select(to_json(env).as("value"))
  }
}

/** DebeziumAdapter: the public Debezium MySQL envelope → graft change
  * batches. The fixture round-trip pins semantic fidelity: a feed
  * serialized into Debezium envelopes and parsed back must replay to
  * the exact q17 oracle state.
  */
class DebeziumAdapterSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.cdc.{CdcApplier, ChangeFeed, DebeziumAdapter}
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def events = Tables.load(spark, dir, "events")
  private def feed = ChangeFeed.fromEvents(events)
  private val rowSchema = org.apache.spark.sql.types.StructType(
    Tables.load(SparkTestSession.spark, "/root/testdata/sf0.001", "events").schema.fields)

  private def toDebeziumJson(f: org.apache.spark.sql.DataFrame,
      wrapped: Boolean): org.apache.spark.sql.DataFrame =
    DebeziumTestFeed.toDebeziumJson(f, rowSchema, wrapped)

  test("fixture feed round-trips through the envelope to the q17 state") {
    val expected = CdcApplier.replayCompact(feed, Seq("user_id"),
        Seq(col("ts"), col("event_id")))
      .select("user_id", "event_id").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parsed = DebeziumAdapter.parse(toDebeziumJson(feed, wrapped = false),
      rowSchema, Seq("user_id"))
    assert(parsed.filter(col("db") =!= "graft" || col("table") =!= "events")
      .isEmpty, "source routing columns must parse")
    val replayed = CdcApplier.replayCompact(
        DebeziumAdapter.forTable(parsed, "graft", "events"),
        Seq("user_id"), DebeziumAdapter.orderCols.map(col))
      .select("user_id", "event_id").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(replayed.sameElements(expected),
      "debezium round-trip must land on the direct-replay state")
  }

  test("schemas.enable wrapper and flat envelope parse identically") {
    val sample = feed.orderBy("event_id").limit(50)
    val flat = DebeziumAdapter.parse(toDebeziumJson(sample, wrapped = false),
      rowSchema, Seq("user_id")).orderBy("_pos").collect()
    val wrapped = DebeziumAdapter.parse(toDebeziumJson(sample, wrapped = true),
      rowSchema, Seq("user_id")).orderBy("_pos").collect()
    assert(flat.sameElements(wrapped))
  }

  test("snapshot reads (op=r) apply as inserts") {
    val json = Seq(
      """{"before":null,"after":{"event_id":1,"ts":"2024-01-01T00:00:00","user_id":5,"event_type":"x","value":1.0,"props":"{}"},"source":{"db":"graft","table":"events","ts_ms":1,"file":"b.1","pos":1},"op":"r","ts_ms":1}""")
      .toDF("value")
    val out = DebeziumAdapter.parse(json, rowSchema, Seq("user_id")).collect()
    assert(out.length == 1 && out(0).getAs[String]("op") == "insert")
    assert(out(0).getAs[Long]("user_id") == 5L)
  }

  test("PK-changing update flows through parse into delete+insert") {
    val json = Seq(
      """{"before":{"event_id":1,"ts":"2024-01-01T00:00:00","user_id":1,"event_type":"x","value":1.0,"props":"{}"},"after":{"event_id":1,"ts":"2024-01-01T00:00:00","user_id":9,"event_type":"x","value":1.0,"props":"{}"},"source":{"db":"g","table":"t","ts_ms":2,"file":"b.1","pos":2},"op":"u","ts_ms":2}""")
      .toDF("value")
    val parsed = DebeziumAdapter.forTable(
      DebeziumAdapter.parse(json, rowSchema, Seq("user_id")), "g", "t")
    val state = Seq((1L, 1L)).toDF("user_id", "event_id")
      .withColumn("ts", lit("2024-01-01T00:00:00").cast("timestamp"))
      .withColumn("event_type", lit("x")).withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .withColumn("_ts_ms", lit(0L)).withColumn("_pos", lit(0L))
      .select("event_id", "ts", "user_id", "event_type", "value", "props",
        "_ts_ms", "_pos")
    val out = CdcApplier.applyBatch(state, parsed, Seq("user_id"),
        DebeziumAdapter.orderCols.map(col))
      .select("user_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(9L), "old key 1 deleted, new key 9 present")
  }

  test("malformed envelope fails the query instead of dropping a change") {
    val json = Seq("""{"op":"z","nope":true}""").toDF("value")
    val ex = intercept[Exception] {
      DebeziumAdapter.parse(json, rowSchema, Seq("user_id")).collect()
    }
    assert(ex.getMessage.contains("debezium") ||
      Option(ex.getCause).exists(_.getMessage.contains("debezium")))
  }
}

/** Adversarial envelope handling: partial/odd-but-valid Debezium
  * inputs must parse predictably; only truly malformed ones raise.
  */
class DebeziumFuzzSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.cdc.DebeziumAdapter
  import spark.implicits._

  private val rowSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.StringType)))

  private def parseOne(json: String) =
    DebeziumAdapter.parse(Seq(json).toDF("value"), rowSchema, Seq("id"))
      .collect()

  test("missing source block still parses (null routing, order from ts_ms)") {
    val out = parseOne(
      """{"before":null,"after":{"id":1,"v":"x"},"op":"c","ts_ms":42}""")
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("op") == "insert" && r.getAs[Long]("_ts_ms") == 42L)
    assert(r.isNullAt(r.fieldIndex("db")) && r.isNullAt(r.fieldIndex("table")))
  }

  test("extra unknown fields in the envelope are ignored") {
    val out = parseOne(
      """{"before":null,"after":{"id":2,"v":"y","extra_col":9},"op":"c",
        |"ts_ms":1,"transaction":{"id":"t1"},"source":{"db":"d","table":"t",
        |"ts_ms":5,"pos":7,"snapshot":"false"}}""".stripMargin.replace("\n", ""))
    assert(out.length == 1 && out(0).getAs[Long]("id") == 2L)
    assert(out(0).getAs[Long]("_ts_ms") == 5L)
  }

  test("delete with null after takes the before image") {
    val out = parseOne(
      """{"before":{"id":3,"v":"z"},"after":null,"op":"d","ts_ms":1,
        |"source":{"db":"d","table":"t","ts_ms":1,"pos":1}}"""
        .stripMargin.replace("\n", ""))
    assert(out(0).getAs[String]("op") == "delete" && out(0).getAs[Long]("id") == 3L)
  }

  test("non-JSON garbage and missing op raise, never silently drop") {
    for (bad <- Seq("not json at all", "{}", """{"after":{"id":1,"v":"x"}}"""))
      intercept[Exception] { parseOne(bad) }
  }
}
