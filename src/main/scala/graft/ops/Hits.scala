package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic integer HITS (Kleinberg 1999) — hub/authority
  * scoring over a directed link graph, the classic complement of
  * [[PageRank]] for web-corpus curation: authorities are the pages
  * good hubs point at, hubs are the pages that point at good
  * authorities (rank link directories vs. cited content when
  * weighting a crawl).
  *
  * All arithmetic is 64-bit integer. Scores start at 1,000,000 and
  * each half-step is
  * `auth'(v) = Σ_{u→v} hub(u)` then `hub'(u) = Σ_{u→v} auth'(v)`,
  * with the L∞ normalization done integrally:
  * `x_norm = x_raw div (max_raw div 10^6)` — divisor-first keeps
  * every intermediate under `max_raw ≤ n·10^6`, so no product ever
  * approaches Long overflow (the `x·10^6 div max` form would
  * overflow past ~9·10^6-degree hubs). Both engines floor on
  * non-negative operands, so every iteration is bit-reproducible.
  * Invariant: after the first half-step every raw max is ≥ 10^6
  * (all hubs start at 10^6 and the graph has at least one edge), so
  * the divisor `max_raw div 10^6` is never zero.
  *
  * Scale shape per half-step, two regimes picked by node count (the
  * [[PageRank]] discipline):
  *
  *  - **Broadcast** (≤ `maxBroadcastNodes`, default 10^7 ≈ 160 MB of
  *    scores): the node-sized score frame is BROADCAST against the
  *    static edge frame — the edge list is never re-shuffled —
  *    followed by one dst- (or src-) keyed sum compacted map-side to
  *    node cardinality, and a broadcast 1-row max.
  *  - **Sharded** (beyond that — the score table no longer fits an
  *    executor): the edge frame is hash-partitioned ONCE per
  *    orientation and checkpointed with that partitioning pinned
  *    ([[PageRank.pinBy]] — HITS joins scores on `src` in the auth
  *    half-step and on `dst` in the hub half-step, so it pins TWO
  *    copies, each paid once and amortized over all iterations).
  *    Per half-step only the node-sized score frame shuffles into
  *    place; zero edge-sized exchanges, plan-asserted in
  *    PipelineSpec ("hits sharded regime: zero edge-sized
  *    exchanges").
  *
  * Plan depth is bounded by a localCheckpoint per half-step.
  */
object Hits {

  /** Hub and authority scores after `iters` full iterations over the
    * directed edge list (columns `src`, `dst`; duplicates collapse).
    * Returns (node, hub, auth) for every node on either edge side.
    *
    * @param maxBroadcastNodes node-count threshold above which the
    *   per-half-step score join switches from broadcast to the
    *   pinned-edge shuffle join (0 forces sharded, Long.MaxValue
    *   forces broadcast — both produce identical bit-exact output)
    * @param nodeCount caller-supplied node count (or upper bound) for
    *   the regime pick; < 0 (default) counts the node frame — one
    *   cheap job against checkpointed node-sized blocks, but a caller
    *   looping HITS variants over the same graph can pass the count
    *   once and pay zero extra jobs per call
    */
  def integerHits(edges: DataFrame, iters: Int,
      maxBroadcastNodes: Long = 10000000L,
      nodeCount: Long = -1L,
      edgesDistinct: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(nodeCount == -1L || nodeCount >= 0L,
      s"nodeCount must be -1 (count the frame) or >= 0: $nodeCount")
    val e0 = edges.select(col("src"), col("dst"))
    // edgesDistinct: caller's promise of no duplicate (src, dst) rows
    // skips one full edge-sized exchange AND the re-materialization
    // ([[PageRank.integerPageRank]] — the promised frame is already
    // checkpointed at the caller; a cheap projection recomputes)
    val e = if (edgesDistinct) e0 else e0.distinct().localCheckpoint()
    // the regime-pick count rides the node materialization job via
    // observe — zero extra actions (the LabelProp checksum pattern)
    val obs = org.apache.spark.sql.Observation()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .observe(obs, count(lit(1)).as("n")).localCheckpoint()
    val useBroadcast =
      (if (nodeCount >= 0) nodeCount
       else obs.get("n").asInstanceOf[Long]) <= maxBroadcastNodes
    val (eBySrc, eByDst) =
      if (useBroadcast) (e, e)
      else (PageRank.pinBy(e, "src"), PageRank.pinBy(e, "dst"))
    var hub = nodes.withColumn("hub", lit(1000000L))
    var auth = nodes.withColumn("auth", lit(0L))
    for (_ <- 1 to iters) {
      auth = normalize(rawSum(eBySrc, nodes,
        hub.select(col("node").as("src"), col("hub").as("score")),
        joinOn = "src", keyedBy = "dst", useBroadcast), "auth").localCheckpoint()
      hub = normalize(rawSum(eByDst, nodes,
        auth.select(col("node").as("dst"), col("auth").as("score")),
        joinOn = "dst", keyedBy = "src", useBroadcast), "hub").localCheckpoint()
    }
    hub.join(auth, Seq("node")).select(col("node"), col("hub"), col("auth"))
  }

  /** Σ score over the edges incident at `keyedBy`, rebased on the
    * node set (isolated-side nodes get 0). Broadcast regime hints
    * the node-sized `scores` frame; sharded regime relies on `e`
    * arriving pinned on `joinOn` so only `scores` moves.
    */
  private[graft] def rawSum(e: DataFrame, nodes: DataFrame, scores: DataFrame,
      joinOn: String, keyedBy: String,
      useBroadcast: Boolean = true): DataFrame =
    nodes.join(
        e.join(if (useBroadcast) broadcast(scores) else scores, Seq(joinOn))
          .groupBy(col(keyedBy).as("node")).agg(sum(col("score")).as("raw")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("raw"), lit(0L)).as("raw"))

  /** Integer L∞ normalization: raw div (max div 10^6), divisor-first
    * (see the overflow note above). The 1-row max broadcasts.
    */
  private def normalize(raw: DataFrame, out: String): DataFrame =
    raw.crossJoin(broadcast(raw.agg(max(col("raw")).as("__mx"))))
      .select(col("node"),
        expr(s"raw div (__mx div 1000000)").as(out))
}
