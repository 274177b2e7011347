package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighbor-set similarity over a directed graph — the co-citation /
  * collaborative-filtering signal: two nodes are similar when their
  * out-neighbor sets overlap (customers buying the same parts, pages
  * citing the same references). The graph-side sibling of the
  * shingle-based [[graft.dedup.Dedup.jaccardPairs]]: same inverted-
  * index shape, with the neighbor playing the shingle's role.
  *
  * Pair generation is the bucketed equi-self-join on the shared
  * neighbor — never all-pairs — so the candidate count is
  * Σ_dst indeg(dst)², which the `maxDF` cap bounds: neighbors with
  * in-degree above `maxDF` (the hot "everyone links this" hubs that
  * carry no similarity signal, exactly the hot-shingle case) are
  * dropped from the graph FIRST, and every downstream count —
  * intersections AND degrees — is exact over that filtered graph, so
  * the reported Jaccard is a well-defined similarity on a
  * well-defined graph rather than a biased estimate of the raw one.
  *
  * Scale shape (100 TB): one distinct + one in-degree aggregate, one
  * dst-keyed self-join with per-bucket fan-out ≤ maxDF², one
  * pair-keyed count, two node-sized degree joins. No cartesian, no
  * node-sized broadcast requirement.
  */
object GraphSim {

  /** Jaccard similarity of out-neighbor sets for every node pair
    * sharing at least one (cold) neighbor, at or above `tau`.
    * Returns (a, b, inter, da, db, jaccard) with a < b; `jaccard`
    * rounds through the shared fixed-point 1e-6 form so thresholding
    * can't split engines on a boundary value.
    */
  def neighborJaccard(edges: DataFrame, maxDF: Long = 64L,
      tau: Double = 0.0, edgesDistinct: Boolean = false): DataFrame = {
    require(maxDF >= 1, s"maxDF must be >= 1: $maxDF")
    // edgesDistinct: caller's promise of no duplicate (src, dst) rows
    // skips one full edge-sized exchange ([[PageRank.integerPageRank]]);
    // the distinct (or promised-distinct) edge frame is materialized
    // ONCE — un-checkpointed it is recomputed by both its consumers
    // below (the in-degree aggregate and the cold join), measured as
    // two duplicate ~1.2 s jobs at sf0.1 on the co-purchase graph
    val e0 = edges.select(col("src"), col("dst"))
    val e = if (edgesDistinct) e0 else e0.distinct().localCheckpoint()
    val cold = e.groupBy(col("dst")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDF).select(col("dst"))
    val ef = e.join(cold, Seq("dst")).localCheckpoint()

    val deg = ef.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val pairs = ef.select(col("dst"), col("src").as("a"))
      .join(ef.select(col("dst"), col("src").as("b")), Seq("dst"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))

    val jac = graft.text.TextAnalysis.round6(
      col("inter").cast("double") /
        (col("da") + col("db") - col("inter")).cast("double"))
    pairs
      .join(deg.select(col("src").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("src").as("b"), col("d").as("db")), Seq("b"))
      .select(col("a"), col("b"), col("inter"), col("da"), col("db"),
        jac.as("jaccard"))
      .filter(col("jaccard") >= tau)
  }
}
