package graft.queries

import graft.Tables
import graft.cdc.{CdcApplier, ChangeFeed}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC apply as a verifiable batch query: derive a deterministic
  * insert/update/delete feed from `events`, time-batch it, fold it
  * through the merge applier, and expose the final table state —
  * the end state the reference's pump loop would leave in ClickHouse
  * (mysqlreader.py:247-354 in /root/reference).
  */
object CdcQueries {

  /** q17: final state after replaying the whole change feed —
    * single-pass compaction (one shuffle: replacingFinal + delete
    * filter), the right plan for historical replay at any scale.
    * The incremental per-batch merge path (applyBatch) is verified
    * separately by the streaming entry (q33_cdc_stream) and by
    * CdcSpec, which asserts fold-of-batches == this compaction.
    */
  def cdcFinalState(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val feed = ChangeFeed.fromEvents(events)
    CdcApplier.replayCompact(feed, Seq("user_id"),
        Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }
}
