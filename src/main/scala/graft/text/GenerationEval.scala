package graft.text

import org.apache.spark.sql.DataFrame
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
    */
  def bleu2(pairs: DataFrame, pairIdCol: String, candCol: String,
      refCol: String): DataFrame = {
    val u = clippedCounts(pairs, pairIdCol, candCol, refCol, 1)
      .withColumnRenamed("total", "total1").withColumnRenamed("clipped", "clip1")
    val b = clippedCounts(pairs, pairIdCol, candCol, refCol, 2)
      .withColumnRenamed("total", "total2").withColumnRenamed("clipped", "clip2")
    def prec(clip: String, total: String) =
      when(col(total) > 0,
        col(clip).cast("double") / col(total).cast("double"))
        .otherwise(lit(0.0))
    pairs.select(col(pairIdCol).as("pair_id"))
      .join(u, Seq("pair_id"), "left")
      .join(b, Seq("pair_id"), "left")
      .na.fill(0L, Seq("total1", "clip1", "total2", "clip2"))
      .withColumn("p1", prec("clip1", "total1"))
      .withColumn("p2", prec("clip2", "total2"))
      .withColumn("bleu2", sqrt(col("p1") * col("p2")))
      .orderBy("pair_id")
  }
}
