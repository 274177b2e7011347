package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adapter from the public Debezium MySQL envelope to the graft
  * change-batch shape — the pluggable live-CDC entry point the
  * reference implements natively as a binlog tail
  * (reader/mysqlreader.py:43-133, 247-354 in /root/reference). Graft
  * swaps the in-process binlog client for the industry-standard
  * wire format: point Debezium (or any producer of its envelope) at
  * MySQL, land the JSON on Kafka or files, and `parse` turns the
  * stream into exactly what [[CdcApplier]] / StreamingCdc consume.
  *
  * Envelope handled (public Debezium contract):
  *  - `op`: c (insert) / u (update) / d (delete) / r (snapshot read,
  *    applied as insert — the reference's initial `migrate` pass);
  *  - `before` / `after`: full row images (`before` null for c/r,
  *    `after` null for d);
  *  - `source.db` / `source.table`: origin routing keys (P4);
  *  - `source.ts_ms`, `source.pos`: binlog position — the total
  *    order `CdcApplier` needs for last-write-wins;
  *  - optionally wrapped in `{schema, payload}` (Debezium's
  *    `schemas.enable=true` mode) — both forms are accepted.
  *
  * PK-changing updates: the before-image key is exposed as
  * `_before_<pk>` columns, which [[CdcApplier.normalizePkChanges]]
  * expands into delete(before) + insert(after) — closing the
  * stale-old-key hole the reference has (mysqlreader.py:322 applies
  * updates keyed on the after-image only).
  *
  * Scale shape: one `from_json` projection per row, no shuffle, no
  * UDF — everything below is codegen'd Column expressions.
  */
object DebeziumAdapter {

  /** The `payload` struct for a given row schema. */
  def payloadSchema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("before", rowSchema),
    StructField("after", rowSchema),
    StructField("source", StructType(Seq(
      StructField("db", StringType),
      StructField("table", StringType),
      StructField("ts_ms", LongType),
      StructField("file", StringType),
      StructField("pos", LongType)))),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Accepts both the flat envelope and the `{schema, payload}`
    * wrapper in one parse: the flat fields and a nested `payload`
    * copy are both projected; whichever is present wins.
    */
  def envelopeSchema(rowSchema: StructType): StructType = {
    val p = payloadSchema(rowSchema)
    StructType(p.fields :+ StructField("payload", p))
  }

  /** Parse raw Debezium JSON (one envelope per row in `valueCol` —
    * the shape of a Kafka `value` or a JSON-lines file) into the
    * graft change batch:
    *
    * `db, table, <rowSchema columns>, _before_<pk>..., op, _ts_ms, _pos`
    *
    * Row columns take the after-image for c/u/r and the before-image
    * for d. `op` is normalized to insert|update|delete. `_ts_ms` is
    * the source (binlog) timestamp, falling back to the envelope
    * timestamp; with `_pos` it forms the order-column pair for
    * [[CdcApplier]]. A malformed line or unknown op fails the query
    * (raise_error) rather than silently dropping a change — CDC
    * correctness over availability, same stance as the reference's
    * fail-fast event loop (mysqlreader.py:412-448).
    */
  def parse(raw: DataFrame, rowSchema: StructType, pk: Seq[String],
      valueCol: String = "value"): DataFrame = {
    require(pk.forall(rowSchema.fieldNames.contains),
      s"pk ${pk.mkString(",")} must be columns of the row schema")
    val e = from_json(col(valueCol), envelopeSchema(rowSchema))
    val parsed = raw.withColumn("_e", e)
      // normalize the two accepted envelope forms to one struct
      .withColumn("_p",
        when(col("_e.payload.op").isNotNull, col("_e.payload"))
          .otherwise(struct(
            col("_e.before").as("before"), col("_e.after").as("after"),
            col("_e.source").as("source"), col("_e.op").as("op"),
            col("_e.ts_ms").as("ts_ms"))))
    val op = col("_p.op")
    val graftOp = when(op.isin("c", "r"), lit("insert"))
      .when(op === "u", lit("update"))
      .when(op === "d", lit("delete"))
      .otherwise(raise_error(concat(
        lit("malformed or unknown debezium envelope: "), col(valueCol))))
    val image = when(op === "d", col("_p.before")).otherwise(col("_p.after"))
    val rowCols: Seq[Column] =
      rowSchema.fieldNames.toSeq.map(f => image.getField(f).as(f))
    val beforePk: Seq[Column] = pk.map(k =>
      when(op === "u", col("_p.before").getField(k))
        .as(CdcApplier.BeforePrefix + k))
    parsed.select(
      col("_p.source.db").as("db") +:
      col("_p.source.table").as("table") +:
      rowCols ++: beforePk ++:
      Seq(graftOp.as(CdcApplier.OpCol),
        coalesce(col("_p.source.ts_ms"), col("_p.ts_ms")).as("_ts_ms"),
        col("_p.source.pos").as("_pos")): _*)
  }

  /** Order columns established by `parse` — binlog order. */
  val orderCols: Seq[String] = Seq("_ts_ms", "_pos")

  /** Restrict a parsed feed to one `db.table` and drop the routing
    * columns — the single-table batch [[CdcApplier]] consumes.
    */
  def forTable(parsed: DataFrame, db: String, table: String): DataFrame =
    parsed.filter(col("db") === db && col("table") === table)
      .drop("db", "table")
}
