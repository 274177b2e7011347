package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Exact heavy hitters at 100-TB scale: find every key whose global
  * count reaches `minCount` WITHOUT a full-cardinality groupBy.
  *
  * The naive `groupBy(key).count.filter` shuffles one record per
  * distinct key — at web scale (URLs, user ids, shingles) that is
  * billions of groups of which only thousands matter. This operator
  * runs in two fixed-memory passes instead:
  *
  *  1. CANDIDATES — each partition summarizes its rows with a
  *     Misra–Gries sketch of `capacity` counters (O(capacity) memory
  *     regardless of partition size). MG guarantees any key with
  *     partition count > n_p/capacity survives the partition's
  *     sketch; by pigeonhole, a key with global count > N/capacity
  *     must exceed that bound in at least one partition, so the union
  *     of partition sketches is a SUPERSET of every global heavy
  *     hitter whenever `minCount > N/capacity` — checked at
  *     runtime, not assumed.
  *  2. VERIFY — the candidate set (≤ capacity × partitions keys,
  *     driver-bounded) broadcasts back and the exact counts of just
  *     those keys are re-aggregated: a broadcast semi-join + one
  *     shuffle whose cardinality is the candidate count, not the key
  *     cardinality.
  *
  * The final output is EXACTLY `groupBy.count.filter(>= minCount)` —
  * deterministic whatever the partitioning, because MG candidate
  * generation only ever over-collects and the recount is exact.
  * (Same generate-then-verify shape as the MinHash/SimHash dedup
  * family: a recall-guaranteed sketch prunes, an exact pass decides.)
  */
object HeavyHitters {

  /** Misra–Gries over one iterator: at most `capacity` counters. On
    * overflow every counter drops by the CURRENT MINIMUM (not 1):
    * each sweep then evicts at least every min-count key, so a
    * hostile all-distinct stream costs one O(capacity) sweep per
    * capacity insertions — amortized O(1) per row — where the
    * decrement-by-1 textbook form degrades to O(capacity) per row.
    * The price is a slightly weaker undercount bound: total
    * decrement mass per sweep is ≥ capacity·δ, so any key's
    * undercount ≤ n/capacity (vs n/(capacity+1)) — the caller's
    * recall bound uses the weaker (safe) form. Returns surviving keys.
    */
  private[graft] def misraGries(it: Iterator[Long], capacity: Int): Iterator[Long] = {
    val counters = mutable.LongMap.empty[Long]
    it.foreach { k =>
      if (counters.contains(k)) counters(k) += 1
      else if (counters.size < capacity) counters(k) = 1
      else {
        var min = Long.MaxValue
        counters.foreachValue(c => if (c < min) min = c)
        val dead = mutable.ArrayBuffer.empty[Long]
        counters.foreachEntry { (key, c) =>
          if (c <= min) dead += key else counters(key) = c - min
        }
        dead.foreach(counters.remove)
      }
    }
    counters.keysIterator
  }

  /** Keys of `df`'s `key` column (long-typed) with exact global count
    * >= `minCount`, as `(key, cnt)` — identical to the full groupBy,
    * computed in fixed memory per task. `capacity` must satisfy the
    * recall bound `minCount > N/capacity`; violating it is an
    * error (silently weaker guarantees are how sketch bugs ship).
    */
  def exactHeavyHitters(df: DataFrame, key: Column, minCount: Long,
      capacity: Int = 4096): DataFrame = {
    require(minCount > 0, s"minCount must be positive: $minCount")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(key.cast("long").as("key")).as[Long]
    // one sketch pass emits, per partition, its row count (for the
    // runtime bound check) AND its MG survivors — no accumulator
    // (retry-unsafe) and no second counting scan over the input.
    val sketched = keys.mapPartitions { it =>
      var n = 0L
      val counted = it.map { k => n += 1; k }
      val cands = misraGries(counted, capacity).map(k => (true, k)).toVector
      Iterator((false, n)) ++ cands.iterator
    }.toDF("is_key", "v").cache()
    val total = sketched.filter(!col("is_key"))
      .agg(coalesce(sum("v"), lit(0L))).head().getLong(0)
    require(minCount > total / capacity,
      s"recall bound violated: minCount=$minCount must exceed " +
        s"N/capacity=${total / capacity} (N=$total, " +
        s"capacity=$capacity) — raise capacity or minCount")
    // candidate set is ≤ capacity × partitions keys — broadcast-sized.
    // Materialize it (localCheckpoint truncates the lineage), then
    // drop the sketch cache so the operator leaves no storage behind.
    val candidates = sketched.filter(col("is_key"))
      .select(col("v").as("key")).distinct().localCheckpoint()
    sketched.unpersist()
    keys.toDF("key")
      .join(broadcast(candidates), "key")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }
}
