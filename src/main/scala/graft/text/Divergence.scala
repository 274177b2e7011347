package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributional distance between each group's token distribution
  * and the corpus mixture — the drift detector behind mixture
  * re-weighting: [[graft.dedup.Dedup.sourceOverlap]] answers "how
  * much of source B does source A literally repeat" (set overlap);
  * this answers "does source A even SPEAK the same distribution as
  * the rest of the corpus" (a source can share almost no exact
  * shingles and still be distributionally identical, or vice versa).
  * Jensen–Shannon divergence is the standard choice: symmetric,
  * bounded (0 .. ln 2 nats), defined even where supports differ.
  *
  * Deliberately source-vs-MIXTURE, not pairwise: the pairwise JSD
  * matrix costs |pairs| × |vocab| (every pair must walk the union
  * vocabulary), which explodes with the source count; the mixture
  * form needs only the (group, token) census joined to the global
  * token totals — for a token ABSENT from a group, its mixture-side
  * contribution is the constant ln 2, so the absent mass collapses
  * to `(N − Σ_{t∈g} C_t) · ln 2` computed from the PRESENT tokens'
  * totals. Nothing is ever enumerated per (group, absent-token).
  *
  * Determinism (the q102 micro-nat discipline): each present
  * token's two log terms are rounded ONCE to integer micro-nats —
  * `Wp = floor(1e6·ln(2cN/(cN+Cn)) + 0.5)` (the group side) and
  * `Wq = floor(1e6·ln(2Cn/(cN+Cn)) + 0.5)` (the mixture side),
  * where c/n are the group's token count/total and C/N the
  * corpus'. The log ARGUMENT is one double division of exact
  * integers, so both engines round the same rational; the masses
  * `Σ c·Wp` and `Σ C·Wq` are exact DECIMAL(38,0) integers, and
  *
  *   jsd = (ma/n + (mb + (N − ΣC_g)·693147)/N) / 2e6
  *
  * is a FIXED IEEE sequence (two divisions, one add, one final
  * division) mirrored op-for-op by the oracle (693147 =
  * round(1e6·ln 2), the absent-token constant).
  *
  * Scale shape: ONE corpus scan to the (group, token) census
  * (map-side combined), global token totals derived from the census
  * (no rescan), one census-sized equi-join token↔totals, one
  * groups-sized rollup. A single-source corpus reports 0.0 for that
  * source exactly (every term's argument is 1).
  *
  * Returns one row per group:
  * `(grp, n_tokens, n_vocab, jsd_nats)` ordered by `grp`.
  */
object Divergence {

  /** The (grp, tok, c) token census behind [[jsdFromMixture]] — ONE
    * map-side-combined corpus scan, the only corpus-sized shuffle.
    * Exposed package-private so the streaming JSD pump can fold
    * per-batch censuses into durable state (token counts are additive
    * and commutative, so drain == batch).
    */
  private[graft] def jsdCensus(df: DataFrame, group: Column,
      text: Column): DataFrame =
    df.select(group.as("grp"),
        explode(TextAnalysis.tokens(text)).as("tok"))
      .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("c"))

  def jsdFromMixture(df: DataFrame, group: Column, text: Column): DataFrame =
    // materialized: the census feeds totals AND the join — one build
    jsdFromCells(jsdCensus(df, group, text).localCheckpoint())

  /** [[jsdFromMixture]] over a pre-built `(grp, tok, c)` census — the
    * face the streaming JSD pump's durable state feeds (the
    * rocAucFromCensus pattern). Same micro-nat weights, same masses,
    * one code path. The caller materializes or persists `cells` (the
    * batch face checkpoints; the pump face reads parquet state) —
    * this function reads it three times (group totals, the global
    * total, the join).
    */
  def jsdFromCells(cells: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val ln2Micro = 693147L // floor(1e6*ln(2) + 0.5)
    // per-group totals and global token totals, both census-derived
    val groupTotals = cells.groupBy(col("grp"))
      .agg(sum(col("c")).as("n"))
    val tokenTotals = cells.groupBy(col("tok"))
      .agg(sum(col("c")).as("big_c"))
    val nTotal = cells.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    require(nTotal > 0, "jsdFromMixture needs a non-empty token census")

    // per present (group, token): the two micro-nat weights; the log
    // argument is ONE double division of exact long integers
    val cN = col("c").cast("double") * lit(nTotal.toDouble)
    val cn = col("big_c").cast("double") * col("n").cast("double")
    val wp = floor(log(lit(2.0) * cN / (cN + cn)) * lit(1e6) + lit(0.5))
      .cast("long")
    val wq = floor(log(lit(2.0) * cn / (cN + cn)) * lit(1e6) + lit(0.5))
      .cast("long")

    cells
      .join(tokenTotals, Seq("tok"))
      .join(groupTotals, Seq("grp"))
      .groupBy(col("grp"))
      .agg(max(col("n")).as("n_tokens"),
        count(lit(1)).as("n_vocab"),
        coalesce(sum(col("c").cast(dec) * wp.cast(dec)), lit(0L).cast(dec))
          .as("ma"),
        coalesce(sum(col("big_c").cast(dec) * wq.cast(dec)),
          lit(0L).cast(dec)).as("mb"),
        coalesce(sum(col("big_c")), lit(0L)).as("sum_cg"))
      .select(col("grp"), col("n_tokens"), col("n_vocab"),
        ((col("ma").cast("double") / col("n_tokens").cast("double") +
          (col("mb") + (lit(nTotal).cast(dec) - col("sum_cg").cast(dec)) *
            lit(ln2Micro).cast(dec)).cast("double") / lit(nTotal.toDouble))
          / lit(2e6)).as("jsd_nats"))
      .orderBy("grp")
  }
}
