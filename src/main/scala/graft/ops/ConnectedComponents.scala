package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star / small-star
  * rounds (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) — the logarithmic-round complement to
  * [[graft.dedup.Dedup.dupClusters]]'s min-label propagation.
  *
  * Label propagation converges in O(diameter) rounds: ideal for
  * near-dup clusters (diameter ≲ 3) but pathological on long-chain
  * graphs — a 10^6-node path needs 10^6 edge-sized rounds. The star
  * algorithm contracts every component toward its minimum node id
  * with geometric progress regardless of shape: each round rewrites
  * every edge to point closer to the component minimum, so chains,
  * rings, and meshes all collapse in logarithmically many rounds in
  * practice (the paper's proven worst-case bound is O(log² n); the
  * 400-node-path spec converges well inside the default budget).
  * The reference has no graph operators at all (dedup is delegated
  * to ClickHouse ReplacingMergeTree, tablesqlbuilder.py:392-398 in
  * /root/reference) — this is north-star extension scope, the
  * training-data pipeline's "collapse near-dup pairs into keeper
  * sets" step hardened for adversarial graph shapes.
  *
  * Scale shape per round: one groupBy(min) on the center node + one
  * same-keyed join back (ReuseExchange shares the shuffle) + one
  * distinct on the rewritten edges — all edge-proportional, no
  * node-sized broadcast, no driver-side graph state. The edge frame
  * shrinks monotonically toward one star row per non-root node, so
  * late rounds are cheap. Lineage is truncated per round
  * (`localCheckpoint`), the [[graft.dedup.Dedup.dupClusters]] /
  * [[PageRank]] loop convention — and the convergence checksum rides
  * that same materializing job via `observe` (the [[KCore]]
  * convention): ONE job per round, no separate aggregate pass.
  *
  * Determinism: every step is a min over a set — order-independent —
  * and the fixpoint (each node linked to its component minimum) is
  * unique, so the output is bit-stable under any partitioning.
  */
object ConnectedComponents {

  /** (doc_id, cluster_id) for every node of the undirected pair
    * graph, cluster_id = minimum node id of the component — the
    * exact output contract of [[graft.dedup.Dedup.dupClusters]]
    * (interchangeable; this one for graphs whose diameter is not
    * known to be small).
    *
    * @param pairs undirected edges, one row per pair
    */
  def starComponents(pairs: DataFrame, maxIter: Int = 50,
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    // canonical undirected form (big, small); self-loops dropped
    var (edges, sig) = checkpointWithChecksum(pairs
      .select(greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val (next, nextSig) = checkpointWithChecksum(smallStar(largeStar(edges)))
      converged = nextSig == sig
      edges = next
      sig = nextSig
      iter += 1
    }
    require(converged, s"star contraction did not converge in $maxIter rounds")
    // fixpoint edges are stars (node > root); roots label themselves
    val labeled = edges.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .unionByName(
        edges.select(col("v").as("doc_id"), col("v").as("cluster_id")))
      .distinct()
    // star-shape invariant: exactly one label per node — violated
    // only if the loop stopped on a checksum collision (~2^-64)
    val maxLabels = labeled.groupBy("doc_id").count()
      .agg(coalesce(max("count"), lit(1L))).head().getLong(0)
    require(maxLabels == 1L,
      s"fixpoint is not a star set (a node carries $maxLabels labels)")
    labeled
  }

  /** Large-star round: every node links its strictly-larger
    * neighbors to the minimum of its neighborhood (incl. itself).
    * Each undirected edge (u, v), u > v, is processed once, at its
    * SMALLER endpoint's star (u is the larger neighbor of center v),
    * and comes out as (u, m(v)) — already canonical since
    * u > v >= m(v).
    */
  private[graft] def largeStar(edges: DataFrame): DataFrame = {
    val adj = edges.unionByName(
      edges.select(col("v").as("u"), col("u").as("v")))
    val m = adj.groupBy(col("u").as("c"))
      .agg(min(col("v")).as("nmin"))
      .select(col("c"), least(col("c"), col("nmin")).as("m"))
    adj.filter(col("v") > col("u"))
      .join(m, col("u") === col("c"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star round: every node links its smaller-or-equal
    * neighbors (and itself) to the minimum among them. Processing an
    * edge at its LARGER endpoint keeps output canonical: center u
    * with smaller-neighbors set S emits (w, min(S)) for w in
    * (S ∪ {u}) \ {min(S)}.
    */
  private[graft] def smallStar(edges: DataFrame): DataFrame = {
    // edges are canonical (u > v): u is the larger endpoint already
    val m = edges.groupBy("u").agg(min(col("v")).as("m"))
    val relinked = edges.join(m, "u")
      .select(col("v").as("w"), col("m"))
      .unionByName(m.select(col("u").as("w"), col("m")))
    relinked.filter(col("w") =!= col("m"))
      .select(col("w").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Checkpoint the round's edge frame with its order-independent
    * signature (commutative xor + overflow-free decimal sum + count
    * over a 64-bit pair hash) observed DURING the materializing job —
    * convergence costs zero extra jobs. The signature drives loop
    * termination only; the star-shape invariant above backstops the
    * astronomically unlikely collision.
    */
  private def checkpointWithChecksum(
      edges: DataFrame): (DataFrame, (Long, String, Long)) = {
    val h = xxhash64(col("u"), col("v"))
    val obs = org.apache.spark.sql.Observation()
    val out = edges.observe(obs,
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("x"),
        coalesce(sum(h.cast("decimal(38,0)")),
          lit(0L).cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n"))
      .localCheckpoint()
    (out, (obs.get("x").asInstanceOf[Long], String.valueOf(obs.get("s")),
      obs.get("n").asInstanceOf[Long]))
  }
}
