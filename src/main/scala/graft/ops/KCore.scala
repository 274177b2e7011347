package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition: iteratively strip nodes of degree < k until
  * every survivor has ≥ k neighbors inside the surviving subgraph —
  * the standard dense-subgraph extractor (link-farm / spam-cluster
  * detection in web-corpus curation, engagement-core isolation in
  * interaction graphs). The peeling fixpoint is unique (the k-core
  * is the maximal subgraph with min-degree ≥ k, independent of
  * removal order), so the result is deterministic under any
  * partitioning. Reference has no graph operators — north-star
  * extension scope beside [[PageRank]] / [[ConnectedComponents]].
  *
  * Scale shape per round: one degree count (map-side combined to
  * node cardinality) + two semi-joins of the edge frame against the
  * shrinking survivor set — all edge-proportional equi-shuffles, no
  * broadcast of anything node-sized required (Spark may still elect
  * one when the survivor frame is small — the right call either
  * way), no driver-side graph state. The edge frame shrinks
  * monotonically; convergence detection rides the SAME job that
  * materializes each round's edges (`observe` during
  * `localCheckpoint` — the [[graft.dedup.Dedup.dupClusters]]
  * convention), so no extra count pass.
  */
object KCore {

  /** Nodes of the k-core of the undirected graph `edges`, with their
    * in-core degree: (node, deg), deg ≥ k. Empty when the graph has
    * no k-core.
    *
    * @param maxBroadcastNodes regime threshold (the [[PageRank]]
    *   discipline): while the node bound (2·|edges|) fits, each
    *   round's keep set is materialized node-sized and BROADCAST into
    *   the two semi-joins, so the surviving edge frame is filtered
    *   map-side — zero edge-sized exchanges per round beyond the one
    *   degree aggregate. Past the bound (graphs whose node set no
    *   longer fits an executor) the joins fall back to the
    *   edge-proportional equi-shuffles. Both regimes produce the
    *   identical fixpoint (peeling is removal-order independent).
    */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 100,
      aCol: String = "a", bCol: String = "b",
      maxBroadcastNodes: Long = 10000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // the initial edge count rides the materialization job (observe —
    // the LabelProp checksum pattern), not a second count() pass
    val obs0 = org.apache.spark.sql.Observation()
    var e = edges
      .select(greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .observe(obs0, count(lit(1)).as("n"))
      .localCheckpoint()
    var nEdges = obs0.get("n").asInstanceOf[Long]
    val useBroadcast = 2L * nEdges <= maxBroadcastNodes
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter && nEdges > 0) {
      val keep0 = degrees(e).filter(col("deg") >= k).select("node")
      // broadcast regime: one node-sized materialization per round
      // (the degree aggregate runs ONCE; un-checkpointed it would be
      // recomputed as the build side of each semi-join)
      val keep = if (useBroadcast) broadcast(keep0.localCheckpoint())
                 else keep0
      val obs = org.apache.spark.sql.Observation()
      val next = e
        .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint()
      val nNext = obs.get("n").asInstanceOf[Long]
      converged = nNext == nEdges
      e = next
      nEdges = nNext
      iter += 1
    }
    require(converged || nEdges == 0,
      s"k-core peeling did not converge in $maxIter rounds")
    degrees(e).filter(col("deg") >= k)
  }

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
}
