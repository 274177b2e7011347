package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-based text overlap metrics — the BLEU building blocks
  * (Papineni et al. 2002) over paired (candidate, reference) texts.
  * The pipeline-side uses: grading a cheap rewriter/normalizer
  * against its source (q111's ExactSubstr rewrite, PII redaction),
  * scoring paraphrase/near-dup candidates beyond set-Jaccard (q24
  * ignores multiplicity; clipped counts do not), and evaluating
  * generated continuations against held-out references.
  *
  * Determinism: clipped counts are exact integers; each precision is
  * ONE cast-to-double-then-divide, and the BLEU-2 geometric mean is
  * `sqrt(p1·p2)` — multiply and sqrt are single correctly-rounded
  * IEEE ops, so the whole number is bit-portable. No brevity
  * penalty: BP needs `exp(1 − r/c)`, and transcendental exp is NOT
  * correctly rounded across libms — callers who need it can apply it
  * to the returned totals; the hashable core stays exact.
  *
  * Scale shape: one (pair_id, gram)-keyed shuffle per n (map-side
  * combined counts), the clip join co-partitioned on the same key,
  * output pair-sized. No corpus self-join, no driver-side text.
  */
object GenerationEval {

  /** Per-pair clipped n-gram counts: `(pair_id, total, clipped)` —
    * `total` = candidate n-gram occurrences (with multiplicity),
    * `clipped` = Σ_gram min(count_cand, count_ref), the modified
    * n-gram precision numerator. Pairs whose candidate has fewer
    * than n tokens yield no row (no grams to grade) — the caller
    * reattaches them with zeros ([[bleu2]] does).
    */
  def clippedCounts(pairs: DataFrame, pairIdCol: String, candCol: String,
      refCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n-gram order must be positive: $n")
    def grams(c: String) = pairs.select(col(pairIdCol).as("pair_id"),
        explode(TextAnalysis.shingles(col(c), n)).as("g"))
      .groupBy(col("pair_id"), col("g"))
    val cand = grams(candCol).agg(count(lit(1)).as("nc"))
    val ref = grams(refCol).agg(count(lit(1)).as("nr"))
    cand.join(ref, Seq("pair_id", "g"), "left")
      .groupBy(col("pair_id"))
      .agg(sum(col("nc")).as("total"),
        sum(least(col("nc"), coalesce(col("nr"), lit(0L)))).as("clipped"))
  }

  /** BLEU-2 report per pair: unigram and bigram clipped precisions
    * plus their geometric mean — `(pair_id, total1, clip1, total2,
    * clip2, p1, p2, bleu2)`. Zero-gram candidates score 0.0, never
    * NULL/NaN.
    *
    * Scale shape: the pairs frame is scanned EXACTLY ONCE — both
    * sides' grams at both orders explode in one tagged projection
    * (n, side-count pair, gram), one (pair_id, n, gram)-keyed
    * map-side-combined aggregate clips, and a conditional pair-keyed
    * regroup pivots the two orders into columns. A per-pair sentinel
    * row rides the same explode so gram-less pairs stay in the
    * report with zeros — no second pass to reattach them. (The
    * naive composition of [[clippedCounts]] per side per order plus
    * an id reattach reads the pairs five times; at corpus scale
    * that is five scans for one metric.)
    */
  def bleu2(pairs: DataFrame, pairIdCol: String, candCol: String,
      refCol: String): DataFrame = {
    def tag(c: String, n: Int, cand: Boolean) =
      transform(TextAnalysis.shingles(col(c), n), g =>
        struct(lit(n).as("n"), lit(if (cand) 1L else 0L).as("nc"),
          lit(if (cand) 0L else 1L).as("nr"), g.as("g")))
    // one guaranteed row per pair (n = 0 contributes to no sum):
    // gram-less pairs survive both groupings with all-zero counts
    val sentinel = array(struct(lit(0).as("n"), lit(0L).as("nc"),
      lit(0L).as("nr"), lit("").as("g")))
    val counts = pairs.select(col(pairIdCol).as("pair_id"),
        explode(concat(sentinel,
          tag(candCol, 1, cand = true), tag(refCol, 1, cand = false),
          tag(candCol, 2, cand = true), tag(refCol, 2, cand = false)))
          .as("r"))
      .groupBy(col("pair_id"), col("r.n").as("n"), col("r.g").as("g"))
      .agg(sum(col("r.nc")).as("nc"), sum(col("r.nr")).as("nr"))
    def totalOf(n: Int) =
      sum(when(col("n") === n, col("nc")).otherwise(lit(0L)))
    def clipOf(n: Int) =
      sum(when(col("n") === n, least(col("nc"), col("nr")))
        .otherwise(lit(0L)))
    def prec(clip: String, total: String) =
      when(col(total) > 0,
        col(clip).cast("double") / col(total).cast("double"))
        .otherwise(lit(0.0))
    counts.groupBy(col("pair_id"))
      .agg(totalOf(1).as("total1"), clipOf(1).as("clip1"),
        totalOf(2).as("total2"), clipOf(2).as("clip2"))
      .withColumn("p1", prec("clip1", "total1"))
      .withColumn("p2", prec("clip2", "total2"))
      .withColumn("bleu2", sqrt(col("p1") * col("p2")))
      .orderBy("pair_id")
  }

  /** chrF report per pair (Popović 2015) — CHARACTER n-gram F-score,
    * the sub-word complement of [[bleu2]]'s word n-grams: morphology
    * variants, typos, and tokenization differences that zero a word
    * n-gram still share most character n-grams, so chrF degrades
    * gracefully where BLEU cliffs. Spaces are removed (the chrF
    * convention) and grams run at orders 1..`maxOrder` (default 6);
    * per order, `P_n = clip/total_cand`, `R_n = clip/total_ref`
    * (clipped counts with multiplicity, exactly the BLEU clip), and
    * `F_n = (1+β²)·P·R / (β²·P + R)` with β FIXED at 2 (recall-
    * weighted, the standard); chrF is the arithmetic mean over the
    * orders — per-order exact integer counts ship beside the score.
    *
    * Determinism: every count is an exact integer; each F_n is the
    * FIXED IEEE sequence (5·P)·R / (4·P + R) over two exact
    * divisions, and the mean is the left-associated sum of the
    * per-order F's divided once — no accumulation-order ambiguity,
    * bit-portable against any engine mirroring the same order.
    * Zero-gram orders (candidate or reference shorter than n after
    * space removal) score F_n = 0.0 and STILL divide by `maxOrder`
    * (fixed denominator — a data-dependent effective-order count
    * would make scores incomparable across pairs), never NULL/NaN.
    *
    * Scale shape: the [[bleu2]] single-scan discipline generalized —
    * both sides' char grams at ALL orders explode in one tagged
    * projection rides ONE (pair_id, n, gram)-keyed map-side-combined
    * aggregate, and a conditional pair-keyed regroup pivots the
    * orders into columns; a sentinel row keeps gram-less pairs in
    * the report. Output pair-sized: `(pair_id, total_c<n>/total_r<n>/
    * clip<n> per order, chrf)`.
    */
  def chrF(pairs: DataFrame, pairIdCol: String, candCol: String,
      refCol: String, maxOrder: Int = 6): DataFrame = {
    require(maxOrder >= 1 && maxOrder <= 8,
      s"maxOrder must be in [1,8]: $maxOrder")
    val sentinel = array(struct(lit(0).as("n"), lit(0L).as("nc"),
      lit(0L).as("nr"), lit("").as("g")))
    // native single-pass gram+tag generation (space-strip, boundary
    // walk, and every order from one buffer) — the HOF composition
    // (per-order filter/transform/sequence + struct transform + a
    // 13-array concat) interprets ~5 nodes per gram, measured ~3x
    // the whole query's cost at sf0.1
    val counts = pairs.select(col(pairIdCol).as("pair_id"),
        explode(concat(sentinel,
          graft.functions.CharGramTags.tags(col(candCol), maxOrder,
            cand = true),
          graft.functions.CharGramTags.tags(col(refCol), maxOrder,
            cand = false))).as("r"))
      .groupBy(col("pair_id"), col("r.n").as("n"), col("r.g").as("g"))
      .agg(sum(col("r.nc")).as("nc"), sum(col("r.nr")).as("nr"))
    def totalC(n: Int) =
      sum(when(col("n") === n, col("nc")).otherwise(lit(0L)))
    def totalR(n: Int) =
      sum(when(col("n") === n, col("nr")).otherwise(lit(0L)))
    def clipOf(n: Int) =
      sum(when(col("n") === n, least(col("nc"), col("nr")))
        .otherwise(lit(0L)))
    val aggs = (1 to maxOrder).flatMap(n => Seq(
      totalC(n).as(s"total_c$n"), totalR(n).as(s"total_r$n"),
      clipOf(n).as(s"clip$n")))
    def fOf(n: Int): Column = {
      val p = when(col(s"total_c$n") > 0,
        col(s"clip$n").cast("double") / col(s"total_c$n").cast("double"))
        .otherwise(lit(0.0))
      val r = when(col(s"total_r$n") > 0,
        col(s"clip$n").cast("double") / col(s"total_r$n").cast("double"))
        .otherwise(lit(0.0))
      // beta = 2: (1+4)PR / (4P + R), the fixed IEEE sequence
      when(lit(4.0) * p + r > 0.0,
          lit(5.0) * p * r / (lit(4.0) * p + r))
        .otherwise(lit(0.0))
    }
    val withF = counts.groupBy(col("pair_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("pair_id") +: (1 to maxOrder).flatMap(n => Seq(
        col(s"total_c$n"), col(s"total_r$n"), col(s"clip$n"))) :+
        (2 to maxOrder).map(fOf).foldLeft(fOf(1))(_ + _)
          .divide(lit(maxOrder.toDouble)).as("chrf"): _*)
    withF.orderBy("pair_id")
  }

  /** ROUGE-L report per pair (Lin 2004) — the ORDER-SENSITIVE
    * complement of [[bleu2]]: clipped n-gram counts ignore where the
    * overlap sits; the longest common subsequence rewards text that
    * preserves the reference's SEQUENCE, so a shuffled bag of the
    * right words scores high BLEU but low ROUGE-L. Returns
    * `(pair_id, m, n, lcs_len, prec, rec, f1)` with m/n the
    * candidate/reference token counts, `prec = LCS/m`,
    * `rec = LCS/n`, and F1 in its algebraically-reduced exact form
    * `2·LCS/(m+n)` (the usual 2PR/(P+R) collapses to it, and this
    * form is ONE correctly-rounded division instead of three).
    * Zero-token sides and zero overlap score 0.0, never NULL/NaN.
    *
    * Determinism: LCS is an exact integer from the native
    * [[graft.functions.LcsLength]] DP; each metric is one
    * cast-to-double-then-divide — bit-portable.
    *
    * Scale shape: zero shuffle — one codegen'd per-row projection
    * over the pairs frame. The DP is O(m·n) PER PAIR, so
    * `maxTokens > 0` bounds both sides (first `maxTokens` tokens) —
    * at corpus scale an unbounded quadratic term on pathological
    * documents is a straggler-maker; the metric is then ROUGE-L of
    * the truncated texts, stated rather than silent.
    */
  def rougeL(pairs: DataFrame, pairIdCol: String, candCol: String,
      refCol: String, maxTokens: Int = 0): DataFrame = {
    require(maxTokens >= 0, s"maxTokens must be >= 0 (0 = unbounded): $maxTokens")
    def toks(c: String) = {
      val t = split(col(c), " ")
      if (maxTokens > 0) slice(t, 1, maxTokens) else t
    }
    pairs.select(col(pairIdCol).as("pair_id"),
        toks(candCol).as("ct"), toks(refCol).as("rt"))
      .select(col("pair_id"),
        size(col("ct")).cast("long").as("m"),
        size(col("rt")).cast("long").as("n"),
        graft.functions.Lcs.lcsLength(col("ct"), col("rt")).as("lcs_len"))
      .select(col("pair_id"), col("m"), col("n"), col("lcs_len"),
        when(col("m") > 0,
            col("lcs_len").cast("double") / col("m").cast("double"))
          .otherwise(lit(0.0)).as("prec"),
        when(col("n") > 0,
            col("lcs_len").cast("double") / col("n").cast("double"))
          .otherwise(lit(0.0)).as("rec"),
        when(col("lcs_len") > 0,
            (lit(2L) * col("lcs_len")).cast("double") /
              (col("m") + col("n")).cast("double"))
          .otherwise(lit(0.0)).as("f1"))
      .orderBy("pair_id")
  }
}
