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

  /** Labels at the FIXPOINT: rounds run until the label frame's
    * order-independent signature repeats — i.e. one full round
    * changed nothing, so every later round is identical (the vote is
    * a pure function of the previous label frame over a static
    * adjacency). Convergence detection rides the checkpointing job
    * via `observe` (the [[ConnectedComponents]] checksum pattern) —
    * ONE job per round, zero extra actions. A label reaches
    * distance-d nodes in d rounds, so the loop runs d+1 rounds on a
    * depth-d graph; `maxIters` backstops graphs where majority votes
    * oscillate (possible in plain LPA; the pinned-seed + (count desc,
    * label asc) vote makes 2-cycles rare but a require guards it).
    *
    * The signature (commutative xor + overflow-free decimal sum +
    * count over xxhash64(node, label)) drives termination only; a
    * collision would need two DIFFERENT consecutive label frames with
    * equal xor AND sum AND count — astronomically unlikely, and the
    * result would still be a valid `propagate(…, iters = r)` output.
    */
  def propagateToFixpoint(edges: DataFrame, seeds: DataFrame,
      maxIters: Int = 50): DataFrame = {
    require(maxIters >= 1, s"maxIters must be >= 1: $maxIters")
    val e = edges.select(col("src"), col("dst")).distinct()
    val adj = PageRank.pinBy(e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst"))), "src")
    val seed = seeds.select(col("node"), col("label"))
      .groupBy(col("node")).agg(min(col("label")).as("label"))
      .localCheckpoint()
    var (labels, sig) = checkpointWithChecksum(seed)
    var converged = false
    var round = 0
    while (!converged && round < maxIters) {
      val (next, nextSig) = checkpointWithChecksum(voteRound(adj, seed, labels))
      converged = nextSig == sig
      labels = next
      sig = nextSig
      round += 1
    }
    require(converged,
      s"LabelProp.propagateToFixpoint: no fixpoint within $maxIters rounds")
    labels
  }

  /** Checkpoint a label frame with its order-independent signature
    * observed DURING the materializing job — convergence costs zero
    * extra jobs (the [[ConnectedComponents]] pattern).
    */
  private def checkpointWithChecksum(
      labels: DataFrame): (DataFrame, (Long, String, Long)) = {
    val h = xxhash64(col("node"), col("label"))
    val obs = org.apache.spark.sql.Observation()
    val out = labels.observe(obs,
        coalesce(expr("bit_xor(xxhash64(node, label))"), lit(0L)).as("x"),
        coalesce(sum(h.cast("decimal(38,0)")),
          lit(0L).cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n"))
      .localCheckpoint()
    (out, (obs.get("x").asInstanceOf[Long], String.valueOf(obs.get("s")),
      obs.get("n").asInstanceOf[Long]))
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
