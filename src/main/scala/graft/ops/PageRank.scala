package graft.ops

import org.apache.spark.sql.DataFrame
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
  * Scale shape per iteration: ranks (node-sized) BROADCAST against
  * the static edge frame — the edge list, the big side, is never
  * re-shuffled across iterations — plus one `dst`-keyed sum
  * compacted map-side to node cardinality. Right up to ~10^7 nodes
  * (a 10M-node rank table ≈ 160 MB broadcast); for social-scale
  * graphs beyond that, swap the hint for a src-bucketed shuffle join
  * and pre-partition the edges once. Plan depth is bounded by a
  * localCheckpoint per round, the [[graft.dedup.Dedup]]
  * label-propagation pattern. Dangling nodes (outdeg 0) simply
  * contribute nothing — their mass exits, as in the standard
  * formulation without dangling redistribution.
  */
object PageRank {

  /** Ranks after `iters` damped iterations over the directed edge
    * list (columns `src`, `dst`; duplicates collapse). Returns
    * (node, rank) for every node appearing on either edge side.
    */
  def integerPageRank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be non-negative: $iters")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val withDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iters) {
      // ranks is node-sized — broadcast it so the edge frame never
      // re-shuffles per iteration; the only exchange per round is
      // the dst-keyed sum, compacted map-side to ~node cardinality
      val contribs = withDeg
        .join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
        .select(col("dst").as("node"),
          expr("(rank * 85) div (100 * outdeg)").as("contrib"))
        .groupBy("node").agg(sum(col("contrib")).as("inmass"))
      ranks = nodes.join(broadcast(contribs), Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + coalesce(col("inmass"), lit(0L))).as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
