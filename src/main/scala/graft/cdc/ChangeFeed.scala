package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic change feed derived from the `events` fixture —
  * the test-time stand-in for the reference's binlog stream
  * (reader/mysqlreader.py:43-133 in /root/reference). Real
  * deployments would plug a Debezium-style source here; the envelope
  * (op + key + values, SURVEY §1.1) is identical.
  */
object ChangeFeed {

  /** Tag each event with a deterministic op mix — 6/10 insert, 3/10
    * update, 1/10 delete (event_id%10: 0-5, 6-8, 9) — mirroring a
    * write-heavy OLTP change mix.
    */
  def fromEvents(events: DataFrame): DataFrame =
    events.withColumn(CdcApplier.OpCol,
      when(pmod(col("event_id"), lit(10)) === 9, "delete")
        .when(pmod(col("event_id"), lit(10)) >= 6, "update")
        .otherwise("insert"))

  /** Split a feed into time-ordered batches by calendar bucket
    * (`unit` = "day" | "week" | "month" | any date_trunc unit) —
    * each batch wholly precedes the next, the precondition for
    * CdcApplier.applyAll. Mirrors the reference's time-based pool
    * flush (bbpool.py:99-180), with calendar buckets standing in
    * for the 60 s flush interval.
    *
    * The feed is persisted before splitting: enumerating the bucket
    * values needs one driver-side action, and each returned batch
    * re-filters the feed — without the persist that is O(buckets)
    * full source re-scans. The caller unpersists when done.
    */
  def timeBatches(feed: DataFrame, unit: String): Seq[DataFrame] = {
    val tagged = feed.withColumn("__b", date_trunc(unit, col("ts"))).persist()
    // null-safe bucket compare (<=>): a null ts row must land in
    // SOME batch (the null bucket, ordered first) — `===` would
    // silently drop it from every batch and diverge from
    // replayCompact over the same feed.
    val buckets = tagged.select(col("__b")).distinct().orderBy("__b")
      .collect().map(_.getTimestamp(0))
    buckets.toIndexedSeq.map { b =>
      tagged.filter(col("__b") <=> lit(b).cast("timestamp")).drop("__b")
    }
  }

  def monthlyBatches(feed: DataFrame): Seq[DataFrame] =
    timeBatches(feed, "month")
}
