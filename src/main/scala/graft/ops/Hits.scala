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
  * Scale shape per half-step (the [[PageRank]] broadcast regime):
  * the node-sized score frame is BROADCAST against the static edge
  * frame — the edge list is never re-shuffled — followed by one
  * dst- (or src-) keyed sum compacted map-side to node cardinality,
  * and a broadcast 1-row max. Past ~10^7 nodes the same src/dst
  * pre-partitioning handoff as [[PageRank.pinBySrc]] applies; the
  * broadcast form is what q119 exercises. Plan depth is bounded by
  * a localCheckpoint per half-step.
  */
object Hits {

  /** Hub and authority scores after `iters` full iterations over the
    * directed edge list (columns `src`, `dst`; duplicates collapse).
    * Returns (node, hub, auth) for every node on either edge side.
    */
  def integerHits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    var hub = nodes.withColumn("hub", lit(1000000L))
    var auth = nodes.withColumn("auth", lit(0L))
    for (_ <- 1 to iters) {
      auth = normalize(rawSum(e, nodes,
        hub.select(col("node").as("src"), col("hub").as("score")),
        joinOn = "src", keyedBy = "dst"), "auth").localCheckpoint()
      hub = normalize(rawSum(e, nodes,
        auth.select(col("node").as("dst"), col("auth").as("score")),
        joinOn = "dst", keyedBy = "src"), "hub").localCheckpoint()
    }
    hub.join(auth, Seq("node")).select(col("node"), col("hub"), col("auth"))
  }

  /** Σ score over the edges incident at `keyedBy`, rebased on the
    * node set (isolated-side nodes get 0). `scores` is node-sized
    * and broadcast; the edge frame stays put.
    */
  private[graft] def rawSum(e: DataFrame, nodes: DataFrame, scores: DataFrame,
      joinOn: String, keyedBy: String): DataFrame =
    nodes.join(
        e.join(broadcast(scores), Seq(joinOn))
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
