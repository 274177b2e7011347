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

  /** nDCG@k (Järvelin & Kekäläinen 2002) with binary relevance over a
    * ranked result list — the graded-position complement of
    * [[recallAtK]]: recall counts relevant ids anywhere in the top k
    * as equals; nDCG discounts each position by `1/log2(rank+1)`, so
    * a system that surfaces the relevant ids FIRST outranks one that
    * buries them at rank k — the standard ranking-quality number for
    * a retrieval gate.
    *
    * Determinism (the q102 micro-unit discipline): each discount is
    * rounded ONCE to integer micro-units, `W(d) = floor(1e6/log2(d+1)
    * + 0.5)` — after which DCG is an exact integer sum `Σ rel_d·W(d)`
    * with no float accumulation order to pin. With BINARY relevance
    * the ideal ranking puts all `n_rel` relevant ids first, so IDCG
    * is the exact prefix sum `cumW(min(k, n_rel))` — a k-entry
    * lookup, no sort — and `ndcg = dcg_micro / ideal_micro` is ONE
    * correctly-rounded IEEE division of exact integers. Queries with
    * no relevant mass report 0.0, never NULL/NaN. [[ndcgWeights]]
    * exposes the table for the unit pin against the hand constants
    * that are also the oracle SQL's literals.
    *
    * Scale shape: `ranked` is a (|Q|·k)-sized result frame
    * (query_id, rnk, rel) and `nRel` a |Q|-sized census
    * (query_id, n_rel) — one query-keyed integer sum and a
    * result-sized join; nothing touches the corpus.
    */
  def ndcgAtK(ranked: DataFrame, nRel: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"k must be in [1,100]: $k")
    val (w, cum) = ndcgWeights(k)
    val wOfRank = (1 to k).foldRight(lit(0L)) { (d, els) =>
      when(col("rnk") === d, lit(w(d - 1))).otherwise(els)
    }
    val dcg = ranked.filter(col("rnk") <= k)
      .groupBy(col("query_id"))
      .agg(sum(when(col("rel") === 1L, wOfRank).otherwise(lit(0L)))
        .as("dcg_micro"))
    val idealOfNRel = (1 to k).foldRight(lit(0L)) { (m, els) =>
      if (m == k) when(col("n_rel") >= k, lit(cum(k - 1))).otherwise(els)
      else when(col("n_rel") === m, lit(cum(m - 1))).otherwise(els)
    }
    nRel.select(col("query_id"), col("n_rel"))
      .join(dcg, Seq("query_id"), "left")
      .withColumn("dcg_micro", coalesce(col("dcg_micro"), lit(0L)))
      .withColumn("ideal_micro", idealOfNRel)
      .select(col("query_id"), col("n_rel"), col("dcg_micro"),
        col("ideal_micro"),
        when(col("ideal_micro") > 0,
            col("dcg_micro").cast("double") /
              col("ideal_micro").cast("double"))
          .otherwise(lit(0.0)).as("ndcg"))
      .orderBy("query_id")
  }

  /** Micro-unit discount table for [[ndcgAtK]]:
    * `(W, cumW)` with `W(d) = floor(1e6/log2(d+1) + 0.5)` and
    * `cumW(m) = Σ_{d≤m} W(d)` (both 1-based). Exposed for the unit
    * pin: every entry sits far from a rounding boundary (nearest
    * fractional distance ~0.058 at d=4), so any libm computing log2
    * to even float precision lands on the same integers.
    */
  private[graft] def ndcgWeights(k: Int): (Seq[Long], Seq[Long]) = {
    val w = (1 to k).map(d =>
      math.floor(1e6 / (math.log(d + 1.0) / math.log(2.0)) + 0.5).toLong)
    (w, (1 to k).map(m => w.take(m).sum))
  }

  /** MAP@k — mean-average-precision's per-query term (AP@k) over the
    * same `(ranked, nRel)` contract as [[ndcgAtK]]: `AP@k =
    * Σ_{d≤k, rel_d=1} P@d / min(n_rel, k)` with `P@d = hits(d)/d`.
    * Where nDCG grades positions by a fixed discount, AP grades each
    * relevant hit by the PRECISION AT ITS RANK — one early miss
    * drags every later hit's contribution down, the strictest of the
    * three ranking grades.
    *
    * Determinism: over the common denominator `L = lcm(1..k)` every
    * `P@d` is the exact integer `hits(d)·(L/d)`, so the AP numerator
    * is ONE exact integer mass and `ap = mass / (L·min(n_rel,k))`
    * ONE correctly-rounded IEEE division (the [[rboHalf]]
    * construction). `hits(d)` is a running sum over the ranked list —
    * a window over ≤ k rows per query, result-sized. k ≤ 20 keeps
    * `L·k` (and every mass) comfortably inside a long.
    */
  def mapAtK(ranked: DataFrame, nRel: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 20,
      s"k must be in [1,20] (lcm(1..k)·k must stay integer-exact): $k")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcmK = (1 to k).foldLeft(1L)((l, d) => l / gcd(l, d) * d)
    val wOfRank = (1 to k).foldRight(lit(0L)) { (d, els) =>
      when(col("rnk") === d, lit(lcmK / d)).otherwise(els)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rnk"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val mass = ranked.filter(col("rnk") <= k)
      .withColumn("hits_at", sum(col("rel")).over(w))
      .filter(col("rel") === 1L)
      .groupBy(col("query_id"))
      .agg(sum(col("hits_at") * wOfRank).as("ap_mass"))
    nRel.select(col("query_id"), col("n_rel"))
      .join(mass, Seq("query_id"), "left")
      .withColumn("ap_mass", coalesce(col("ap_mass"), lit(0L)))
      .select(col("query_id"), col("n_rel"), col("ap_mass"),
        when(col("n_rel") > 0,
            col("ap_mass").cast("double") /
              (lit(lcmK) * least(col("n_rel"), lit(k.toLong)))
                .cast("double"))
          .otherwise(lit(0.0)).as("ap"))
      .orderBy("query_id")
  }
}
