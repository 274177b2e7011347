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

  /** q17: final state after replaying the change feed in monthly
    * batches. Equivalent SQL: last event per key wins unless it is a
    * delete — which is exactly what the DuckDB oracle checks, so the
    * multi-batch merge path is verified against an independent
    * single-pass formulation.
    */
  def cdcFinalState(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val feed = ChangeFeed.fromEvents(events)
    val batches = ChangeFeed.monthlyBatches(feed)
    val initial = events.limit(0)
    CdcApplier.applyAll(initial, batches, Seq("user_id"),
        Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }
}
