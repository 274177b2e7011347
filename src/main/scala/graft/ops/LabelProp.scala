package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded label propagation over an undirected graph — the
  * semi-supervised classifier of graph curation: a trusted seed set
  * carries labels (domain quality tiers, topic classes, spam marks)
  * and every other node takes the majority label of its labeled
  * neighbors, iterated. The deterministic cousin of classic LPA:
  * seeds are PINNED (they never relabel — the TrustRank stance, like
  * [[PageRank.personalizedPageRank]]'s seed gating), and the
  * per-node vote breaks ties as (count desc, label asc), so the
  * fixpoint is independent of partitioning and iteration interleave.
  *
  * Scale shape per round: the doubled adjacency frame is
  * hash-partitioned by `src` ONCE and checkpointed with that
  * partitioning pinned ([[PageRank.pinBy]]), so each round's label
  * join moves only the node-sized label frame (Spark may still
  * elect to broadcast a small label table — cheaper yet, and the
  * edge side stays put either way); then one (node, label) count
  * aggregate (map-side combined, output bounded by node × label
  * alphabet) and one per-node window over that candidate frame.
  * Plan depth is bounded by a localCheckpoint per round, the
  * [[PageRank]] loop convention.
  */
object LabelProp {

  /** Labels after `iters` rounds: (node, label) for every node that
    * acquired one (nodes with no labeled neighbor within `iters`
    * hops stay absent). `seeds` columns: (node, label); `edges`
    * columns: (src, dst), undirected (both orientations derived).
    */
  def propagate(edges: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.select(col("src"), col("dst")).distinct()
    val adj = PageRank.pinBy(e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst"))), "src")
    // conflicting seed labels for one node resolve deterministically
    // to the minimum label (one row per node — duplicate seed rows
    // would otherwise double-vote neighbors and emit contradicting
    // output rows every round)
    val seed = seeds.select(col("node"), col("label"))
      .groupBy(col("node")).agg(min(col("label")).as("label"))
      .localCheckpoint()
    var labels = seed
    for (_ <- 1 to iters)
      labels = voteRound(adj, seed, labels).localCheckpoint()
    labels
  }

  /** One vote round (un-checkpointed, so tests can pin its plan):
    * labeled neighbors vote at the other endpoint, each node takes
    * the (count desc, label asc) winner, pinned seeds win over any
    * vote.
    */
  private[graft] def voteRound(adj: DataFrame, seed: DataFrame,
      labels: DataFrame): DataFrame = {
    val votes = adj
      .join(labels.withColumnRenamed("node", "src"), Seq("src"))
      .groupBy(col("dst").as("node"), col("label"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("node"))
      .orderBy(col("cnt").desc, col("label"))
    val picked = votes
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("node"), col("label"))
    seed.unionByName(
      picked.join(seed.select("node"), Seq("node"), "left_anti"))
  }
}
