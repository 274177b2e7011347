package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN quality evaluation — "measure, don't guess": recall@k of an
  * approximate top-k result against the exact baseline, per query.
  * The acceptance gate every quantized/bucketed index variant
  * (int8, IVF, PQ, RP-LSH) should clear before replacing the exact
  * scan in a pipeline; unit tests pin recall on fixtures, this
  * operator measures it on the corpus at hand.
  *
  * Determinism: membership intersection + exact integer counts +
  * one ppm floor division — bit-identical anywhere.
  *
  * Scale shape: one (query_id, vec_id)-keyed semi-join of two
  * (|Q|·k)-sized result frames and a query-keyed count — everything
  * is result-sized, nothing touches the corpus.
  */
object Eval {

  /** (query_id, hits, recall_ppm) per query of `exact`: how many of
    * the exact top-k ids the approximate result recovered. Both
    * inputs use the (query_id, …, vec_id) result contract of
    * [[VectorSearch]]'s top-k family.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val hits = exact.select(col("query_id"), col("vec_id"))
      .join(approx.select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("recall_ppm", expr(s"(hits * 1000000) div ${k}L"))
      .select(col("query_id"), col("hits"), col("recall_ppm"))
  }

  /** Truncated rank-biased overlap (Webber, Moffat & Zobel 2010)
    * between the exact and approximate top-k lists, per query —
    * [[recallAtK]]'s top-weighted complement: recall treats rank 1
    * and rank k as equals, RBO geometrically discounts depth, so an
    * index that nails the head but fuzzes the tail outranks one that
    * does the reverse — the right grade when the pipeline consumes
    * the head of the list (hard-negative mining, retrieval contexts).
    *
    * Persistence is FIXED at p = 1/2, which makes every term an
    * exact dyadic rational: RBO@k = (1−p)·Σ_{d=1..k} p^(d−1)·|A_d ∩
    * B_d|/d = Σ_d ov_d/(d·2^d). Over the common denominator
    * D = lcm(1..k)·2^k the whole sum is ONE exact integer mass
    * divided once by D — bit-portable with no float accumulation
    * order to pin (an arbitrary p would need pow() and an ordered
    * float sum, neither of which hashes identically across engines).
    * This is the TRUNCATED sum (no extrapolation term); at p = 1/2
    * the mass beyond depth k is < 2^−k, so RBO@k of identical lists
    * is 1 − 2^−k, not 1.
    *
    * Mechanics: a matched id with ranks (r_A, r_B) is in both prefix
    * sets for every d ≥ m = max(r_A, r_B), so it contributes the
    * precomputed integer weight W(m) = Σ_{d=m..k} D/(d·2^d) — the
    * whole metric is one (query_id, vec_id) equi-join of two
    * (|Q|·k)-sized result frames, a k-entry weight lookup, and a
    * query-keyed integer sum. Nothing touches the corpus.
    *
    * Both inputs use the (query_id, rnk, …, vec_id) result contract
    * of [[VectorSearch]]'s top-k family. Returns
    * `(query_id, mass, rbo)` with `rbo = mass / D`.
    */
  def rboHalf(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 16,
      s"k must be in [1,16] (lcm(1..k)·2^k must stay integer-exact): $k")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcm = (1 to k).foldLeft(1L)((l, d) => l / gcd(l, d) * d)
    val dTot = lcm * (1L << k)
    val coef = (1 to k).map(d => dTot / (d.toLong * (1L << d)))
    val cum = (1 to k).map(m => coef.drop(m - 1).sum) // W(m), 1-based
    val wOfM = (1 to k).foldRight(lit(0L)) { (m, els) =>
      when(col("m") === m, lit(cum(m - 1))).otherwise(els)
    }
    val mass = exact.select(col("query_id"), col("vec_id"),
        col("rnk").as("re"))
      .join(approx.select(col("query_id"), col("vec_id"),
        col("rnk").as("ra")), Seq("query_id", "vec_id"))
      .withColumn("m", greatest(col("re"), col("ra")))
      .groupBy(col("query_id")).agg(sum(wOfM).as("mass"))
    exact.select(col("query_id")).distinct()
      .join(mass, Seq("query_id"), "left")
      .withColumn("mass", coalesce(col("mass"), lit(0L)))
      .select(col("query_id"), col("mass"),
        (col("mass").cast("double") / lit(dTot).cast("double")).as("rbo"))
      .orderBy("query_id")
  }

  /** The k=10 weight table [[rboHalf]] uses, exposed for the unit
    * pin against hand-computed constants (which are also the oracle
    * SQL's literals).
    */
  private[graft] def rboWeights(k: Int): (Long, Seq[Long]) = {
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcm = (1 to k).foldLeft(1L)((l, d) => l / gcd(l, d) * d)
    val dTot = lcm * (1L << k)
    val coef = (1 to k).map(d => dTot / (d.toLong * (1L << d)))
    (dTot, (1 to k).map(m => coef.drop(m - 1).sum))
  }
}
