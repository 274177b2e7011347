package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic integer PageRank — graph authority scoring, a
  * standard quality signal for web-corpus curation (rank domains by
  * link authority, weight documents by their host's score).
  *
  * All arithmetic is 64-bit integer: ranks live in millionths
  * (rank₀ = 1,000,000), one iteration is
  * `rank' = 150,000 + Σ_{u→v} (rank_u · 85) div (100 · outdeg_u)`
  * — the damping-0.85 update with integral floor division, so every
  * iteration is exact and bit-reproducible in any engine (float
  * PageRank sums are partitioning-order-dependent). The div-floor
  * truncation leaks < 1 millionth of mass per edge per iteration —
  * irrelevant to ranking, essential to determinism.
  *
  * Scale shape per iteration, two regimes picked by node count:
  *
  *  - **Broadcast** (≤ `maxBroadcastNodes`, default 10^7 ≈ 160 MB of
  *    ranks): the node-sized rank frame is BROADCAST against the
  *    static edge frame — the edge list, the big side, is never
  *    re-shuffled across iterations — plus one `dst`-keyed sum
  *    compacted map-side to node cardinality.
  *  - **Sharded** (beyond that — social-scale graphs where the rank
  *    table itself no longer fits an executor): the edge frame is
  *    hash-partitioned by `src` ONCE and checkpointed with that
  *    partitioning pinned, so each round's rank join shuffles only
  *    the node-sized rank frame into place while the edge side stays
  *    put — per round, two node-sized exchanges (ranks→src, dst-sum)
  *    and zero edge-sized ones.
  *
  * Plan depth is bounded by a localCheckpoint per round, the
  * [[graft.dedup.Dedup]] label-propagation pattern. Dangling nodes
  * (outdeg 0) simply contribute nothing — their mass exits, as in
  * the standard formulation without dangling redistribution.
  */
object PageRank {

  /** Ranks after `iters` damped iterations over the directed edge
    * list (columns `src`, `dst`; duplicates collapse). Returns
    * (node, rank) for every node appearing on either edge side.
    *
    * @param maxBroadcastNodes node-count threshold above which the
    *   per-round rank join switches from broadcast to the src-sharded
    *   shuffle join (0 forces sharded, Long.MaxValue forces broadcast
    *   — both produce identical bit-exact output)
    * @param edgesDistinct caller's promise that `edges` carries no
    *   duplicate (src, dst) rows, skipping the internal `distinct()`
    *   — one full edge-sized exchange. The co-purchase callers build
    *   their edge list through a distinct already; re-deduplicating
    *   the result was pure shuffle cost.
    */
  def integerPageRank(edges: DataFrame, iters: Int,
      maxBroadcastNodes: Long = 10000000L,
      edgesDistinct: Boolean = false): DataFrame =
    run(edges, iters, maxBroadcastNodes, _ => lit(true), edgesDistinct)

  /** Personalized (topic-sensitive) integer PageRank, Haveliwala
    * WWW'02: teleport mass flows ONLY to the `seed` node set, so
    * authority is measured relative to the seeds — the "propagate
    * quality outward from a trusted domain list" scoring used in
    * web-corpus curation (seed-quality propagation / TrustRank
    * shape). Seeds start at rank 10^6 and receive the 150000
    * per-round teleport; non-seeds start (and teleport) at 0 and
    * accumulate only flowed-in mass. Same regimes, same exact
    * integer arithmetic, same bit-reproducibility as
    * [[integerPageRank]].
    *
    * @param seed boolean predicate over the node-id column
    */
  def personalizedPageRank(edges: DataFrame, iters: Int,
      seed: Column => Column,
      maxBroadcastNodes: Long = 10000000L,
      edgesDistinct: Boolean = false): DataFrame =
    run(edges, iters, maxBroadcastNodes, seed, edgesDistinct)

  private def run(edges: DataFrame, iters: Int, maxBroadcastNodes: Long,
      seed: Column => Column, edgesDistinct: Boolean = false): DataFrame = {
    require(iters >= 0, s"iters must be non-negative: $iters")
    val e0 = edges.select(col("src"), col("dst"))
    // edgesDistinct callers hand over an already-deduplicated (and in
    // practice already-materialized) frame: skip both the distinct
    // exchange AND the second materialization — recomputing a cheap
    // projection per consumer beats writing the edge frame out twice
    val e = if (edgesDistinct) e0 else e0.distinct().localCheckpoint()
    // the regime-pick count rides the node materialization job via
    // observe — zero extra actions (the LabelProp checksum pattern)
    val obs = org.apache.spark.sql.Observation()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .observe(obs, count(lit(1)).as("n")).localCheckpoint()
    val useBroadcast = obs.get("n").asInstanceOf[Long] <= maxBroadcastNodes
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg =
      if (useBroadcast) e.join(deg, "src").localCheckpoint()
      else pinBySrc(e.join(deg, "src"))
    val teleport = (n: Column) =>
      when(seed(n), lit(150000L)).otherwise(lit(0L))
    var ranks = nodes.withColumn("rank",
      when(seed(col("node")), lit(1000000L)).otherwise(lit(0L)))
    for (_ <- 1 to iters)
      ranks = oneRound(withDeg, nodes, ranks, useBroadcast, teleport)
        .localCheckpoint()
    ranks
  }

  /** Checkpoint `df` with `hashpartitioning(src)` pinned, so every
    * round's rank join reuses it and the edge frame — the big side —
    * never re-shuffles. Under AQE, `Dataset.localCheckpoint` captures
    * the adaptive plan's pre-execution partitioning, which is
    * `UnknownPartitioning(0)`; AQE is therefore disabled around this
    * one eager action (a single edge-sized shuffle, paid once and
    * amortized over all iterations). Caching (`persist`) does not
    * work either: in Spark 4 the cached-plan output partitioning is
    * itself adaptive and reports unknown.
    */
  private[graft] def pinBySrc(df: DataFrame): DataFrame = pinBy(df, "src")

  /** The general form of [[pinBySrc]] — [[Hits]] needs the edge
    * frame pinned on BOTH orientations (src for its hub half-step,
    * dst for its auth half-step).
    */
  private[graft] def pinBy(df: DataFrame, key: String): DataFrame = {
    val conf = df.sparkSession.conf
    val aqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try df.repartition(col(key)).localCheckpoint()
    finally conf.set("spark.sql.adaptive.enabled", aqe)
  }

  /** One damped update (un-checkpointed, so tests can pin its plan):
    * join current ranks onto the (possibly src-pre-partitioned) edge
    * frame, sum contributions by destination, rebase on the node set.
    */
  private[graft] def oneRound(withDeg: DataFrame, nodes: DataFrame,
      ranks: DataFrame, useBroadcast: Boolean,
      teleport: Column => Column = _ => lit(150000L)): DataFrame = {
    val roundRanks = ranks.withColumnRenamed("node", "src")
    val contribs = withDeg
      .join(if (useBroadcast) broadcast(roundRanks) else roundRanks, "src")
      .select(col("dst").as("node"),
        expr("(rank * 85) div (100 * outdeg)").as("contrib"))
      .groupBy("node").agg(sum(col("contrib")).as("inmass"))
    nodes.join(
        if (useBroadcast) broadcast(contribs) else contribs, Seq("node"), "left")
      .select(col("node"),
        (teleport(col("node")) + coalesce(col("inmass"), lit(0L))).as("rank"))
  }
}
