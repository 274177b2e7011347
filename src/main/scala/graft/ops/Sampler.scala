package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the training-mix step of a
  * large-scale data pipeline: draw each stratum (language, source,
  * quality band…) at its own rate, reproducibly, with NO shuffle and
  * NO random state. Selection is a pure per-row predicate
  * `u(id) < rate(stratum)`, so the sample is:
  *
  *  - scan-proportional at any scale (a filter pushed at the scan —
  *    the 100-TB plan is one pass, zero exchanges);
  *  - stable under re-runs, partitioning, and cluster size (u
  *    depends only on the row id, never on task order — unlike
  *    `df.sample`, whose per-partition RNG changes with the split);
  *  - incremental-friendly: new rows join the sample without
  *    disturbing prior membership (the property reservoir sampling
  *    lacks).
  *
  * The reference has no sampling surface; this is north-star
  * extension scope alongside the dedup family (SURVEY §7.1 step 7).
  */
object Sampler {

  /** Production uniform: xxhash64 → [0, 1). Full 64-bit avalanche —
    * use this unless cross-engine reproducibility is required.
    */
  def uniformHash(id: Column, seed: Int = 42): Column =
    pmod(xxhash64(id, lit(seed)), lit(1L << 40)).cast("double") /
      (1L << 40).toDouble

  /** Portable uniform: Knuth multiplicative hash,
    * `(id * 2654435761) mod 2^32 / 2^32` — weaker mixing than
    * xxhash64 but expressible verbatim in ANSI SQL, so an external
    * engine can reproduce the exact sample (the oracle path).
    *
    * The product is computed overflow-safely for ANY non-negative
    * Long id: `(id·K) mod 2^32` depends only on `id mod 2^32`, and
    * splitting that residue into 16-bit halves keeps every
    * intermediate ≤ ~2^48 (the naive `id * K` overflows Long past
    * id ≈ 3.5e9 — ids at the 1e10 scale hit exactly that under ANSI
    * mode; caught by the 10× scale soak). Values are bit-identical
    * to the naive formula wherever it doesn't overflow.
    */
  def uniformKnuth(id: Column): Column = {
    val K = lit(2654435761L)
    val a = pmod(id, lit(1L << 32))
    val ah = shiftright(a, 16)
    val al = a.bitwiseAND(lit(0xFFFFL))
    // (a·K) mod 2^32 = ((ah·K mod 2^16)·2^16 + al·K) mod 2^32
    pmod(pmod(ah * K, lit(1L << 16)) * lit(1L << 16) + al * K, lit(1L << 32))
      .cast("double") / (1L << 32).toDouble
  }

  /** Per-stratum rate expression: `rates` maps stratum value → rate,
    * `defaultRate` covers unlisted strata.
    */
  def rateFor(stratum: Column, rates: Map[String, Double],
      defaultRate: Double): Column =
    rates.foldRight(lit(defaultRate): Column) { case ((k, r), els) =>
      when(stratum === k, lit(r)).otherwise(els)
    }

  /** Stratified Bernoulli sample: keep a row iff `u < rate(stratum)`.
    * Expected per-stratum size = rate × stratum size; for exact
    * per-stratum counts use [[stratifiedFixedSample]] (which pays
    * the per-stratum shuffle the Bernoulli form avoids).
    */
  def stratifiedSample(df: DataFrame, stratum: Column, u: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame =
    df.filter(u < rateFor(stratum, rates, defaultRate))

  /** Stratified EXACT-size sample: the `k` rows of each stratum
    * with the smallest `u`, ties broken by `tiebreak` (which must
    * make (u, tiebreak) a total order — a unique id). Deterministic
    * like the Bernoulli form (membership depends only on row
    * identity), but with a guaranteed per-stratum count — the
    * "exactly 100k docs per language" requirement Bernoulli can only
    * hit in expectation.
    *
    * Scale shape: one shuffle on the stratum key; the rank filter
    * plans as WindowGroupLimit, so each map task forwards only its
    * local top-k per stratum and the post-shuffle sort touches at
    * most k·partitions rows per stratum, not the stratum. Skew
    * bound: the largest stratum costs its top-k maintenance, not a
    * full sort.
    */
  def stratifiedFixedSample(df: DataFrame, stratum: Column, u: Column,
      tiebreak: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(stratum).orderBy(u, tiebreak)))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Efraimidis–Spirakis A-ES key `u^(1/w)`: taking the k LARGEST
    * keys draws an exact probability-proportional-to-size sample
    * without replacement. The production weighted sampler —
    * deterministic within the engine (hash uniforms), but `pow` is
    * not an IEEE correctly-rounded operation, so the key itself is
    * not bit-reproducible by an external engine; cross-engine
    * verification uses [[weightedPriorityKey]] instead.
    */
  def aresKey(id: Column, weight: Column, seed: Int = 42): Column =
    pow(uniformHash(id, seed), lit(1.0) / weight.cast("double"))

  /** Portable weighted priority `u(id)/w`: the k SMALLEST priorities
    * form a weighted sample biased toward heavy rows (selection odds
    * scale with w, though not the exact PPS law of [[aresKey]] — an
    * item's priority beats an exp(1)-race only linearly). Every
    * ingredient is exact (u is an integer over 2^32, w an integer)
    * and the single division is correctly rounded, so the priority
    * column is bit-identical in any IEEE engine — the oracle-checkable
    * face of weighted sampling.
    *
    * Scale shape: per-row arithmetic at the scan; a global top-k by
    * priority plans as TakeOrderedAndProject (per-partition heaps,
    * never a full sort).
    */
  def weightedPriorityKey(id: Column, weight: Column): Column =
    uniformKnuth(id) / weight.cast("double")

  /** Temperature-weighted source mixing (α = 0.5): draw a total
    * budget of `1/num` of the corpus, allocated across strata
    * proportionally to √count — the classic temperature re-weighting
    * that upsamples small sources relative to their natural share
    * (multilingual/LLM mixture sampling à la GPT-3 / mT5 appendix
    * recipes). α = 0.5 specifically because its power function is
    * `sqrt`, the one IEEE-correctly-rounded root — so with the
    * quota arithmetic kept integer (`floor(sqrt(c))`, then
    * `target·isq div Σisq`), the allocation is bit-reproducible in
    * any engine, unlike a general `pow(c, α)` (see [[aresKey]]).
    * Membership inside a stratum is the [[stratifiedFixedSample]]
    * rule: smallest (uniformKnuth(id), id) first, up to the quota.
    *
    * Scale shape: the stratum-count frame is DRIVER-sized (one row
    * per source — the kmeans-centroid shape), so the quotas come
    * back as literals: the rank filter keeps a LITERAL bound
    * (`rn ≤ max quota`), which is what lets Spark plan the window as
    * WindowGroupLimit — each map task forwards only its local
    * top-maxQuota per stratum instead of sorting the stratum (a
    * column-valued bound would disable the rewrite). The corpus pays
    * ONE shuffle on the stratum key; the exact per-stratum cut is a
    * when-chain over the same literals. A stratum smaller than its
    * quota just yields all its rows (the allocation of a tiny
    * stratum can exceed its size — √-weighting upsamples small
    * sources, it cannot mint rows).
    */
  def temperatureMix(df: DataFrame, stratum: String, idCol: String,
      num: Int = 4): DataFrame = {
    require(num > 0, s"num must be positive: $num")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(stratum)).agg(count(lit(1)).as("c"))
      .collect().map(r => r.get(0) -> r.getLong(1))
    require(counts.nonEmpty, "temperatureMix on an empty corpus")
    val isq = counts.map { case (s, c) => s -> math.sqrt(c.toDouble).toLong }
    val t = isq.map(_._2).sum
    val target = counts.map(_._2).sum / num
    val quotas = isq.map { case (s, q) => s -> target * q / t }
    val maxQ = quotas.map(_._2).max
    val quotaFor = quotas.foldRight(lit(0L): Column) { case ((s, q), els) =>
      when(col(stratum) === lit(s), lit(q)).otherwise(els)
    }
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(col(stratum))
          .orderBy(uniformKnuth(col(idCol)), col(idCol))))
      .filter(col("__rn") <= lit(maxQ) && col("__rn") <= quotaFor)
      .select(col(idCol), col(stratum))
  }

  /** Nucleus (top-p) selection per group — the score-mass analog of
    * the count quotas above: order each group by (score desc, id)
    * and keep the rows that START before the `pPpm` fraction of the
    * group's total score mass (the crossing row is kept, like
    * nucleus sampling's crossing token). "The best documents until
    * 80% of the mass" per source, deterministically.
    *
    * Determinism and overflow: all mass arithmetic rides
    * DECIMAL(38,0) products with floor `div` — exact at any corpus
    * mass (a LONG×10^6 product overflows past ~9·10^12 total mass;
    * a 100 TB corpus's char-count mass is ~10^14).
    *
    * Scale shape: ONE hash shuffle on the group key feeds both
    * windows (running mass, group total). Per-group ordering is a
    * group-sized sort — the exact-per-group contract shared with
    * QuantileNorm/SCD.
    *
    * Returns (id, grp, v, cum, share_ppm) for the kept rows.
    */
  def topPByGroup(df: DataFrame, idCol: Column, groupCol: Column,
      scoreCol: Column, pPpm: Long): DataFrame = {
    require(pPpm > 0 && pPpm <= 1000000L, s"pPpm must be in (0, 1e6]: $pPpm")
    import org.apache.spark.sql.expressions.Window
    val grpW = Window.partitionBy(col("grp"))
    val runW = grpW.orderBy(col("v").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(idCol.as("id"), groupCol.as("grp"),
        scoreCol.cast("long").as("v"))
      .withColumn("cum", sum(col("v")).over(runW))
      .withColumn("__tot", sum(col("v")).over(grpW))
      .filter(expr("CAST(cum - v AS DECIMAL(38,0)) * 1000000 < " +
        s"CAST(__tot AS DECIMAL(38,0)) * ${pPpm}L"))
      .select(col("id"), col("grp"), col("v"), col("cum"),
        expr("(CAST(cum AS DECIMAL(38,0)) * 1000000) div __tot")
          .as("share_ppm"))
  }
}
