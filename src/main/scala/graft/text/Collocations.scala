package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level collocation mining: top-K adjacent-bigram
  * associations by pointwise mutual information. A standard
  * vocabulary/tokenizer-design signal (which word pairs behave as a
  * unit and deserve a merged token) and a quality probe (machine-
  * generated boilerplate shows abnormal collocation mass). The
  * reference has no corpus statistics at all — north-star extension
  * scope alongside TF-IDF ([[TextAnalysis.tfidfTopTerms]]).
  *
  * The association score is exp-PMI in parts-per-million, kept in
  * EXACT integer arithmetic end to end:
  * `score_ppm = (c_xy · N · 10^6) div (c_x · c_y)`
  * where N is the corpus unigram total — this is `exp(PMI) · 10^6`,
  * strictly monotone in PMI, with the numerator product carried in
  * DECIMAL(38,0) so it cannot overflow (c_xy·N·10^6 ≤ 10^38 up to
  * ~10^12-token corpora) and the single integral division truncating
  * deterministically. A float log-PMI would be engine- and
  * order-dependent in the last ulp; this is bit-stable anywhere.
  *
  * Scale shape: two count shuffles (bigrams, unigrams) — both
  * map-side combined to vocabulary cardinality, tiny relative to the
  * corpus — then two BROADCAST joins of the vocabulary-sized unigram
  * frame onto the bigram counts, one broadcast of the single-row
  * total, and a driver top-K (TakeOrderedAndProject: per-partition
  * heap of K, never a global sort). The corpus itself is scanned
  * once and never shuffled.
  */
object Collocations {

  /** Top-`topK` adjacent bigrams by exp-PMI (ties broken by the
    * bigram itself), among bigrams occurring at least `minCount`
    * times. Output (w1, w2, c_xy, score_ppm), score descending.
    */
  def pmiBigrams(docs: DataFrame, minCount: Long = 5L, topK: Int = 50,
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(TextAnalysis.tokens(col(textCol)).as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("n_total"))
    val bi = toks.select(explode(expr(
        // adjacent pairs: element i of the size-(n-1) slice pairs
        // with its right neighbor (Spark [] indexing is 0-based)
        "transform(slice(toks, 1, greatest(size(toks) - 1, 0))," +
          " (w, i) -> struct(w AS w1, toks[i + 1] AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    bi
      .join(broadcast(uni.select(col("w").as("w1"), col("c").as("c1"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c2"))), "w2")
      .crossJoin(broadcast(total))
      .withColumn("score_ppm", expr(
        "(CAST(c_xy AS DECIMAL(38,0)) * n_total * 1000000)" +
          " div (CAST(c1 AS DECIMAL(38,0)) * c2)"))
      .select("w1", "w2", "c_xy", "score_ppm")
      .orderBy(col("score_ppm").desc, col("w1"), col("w2"))
      .limit(topK)
  }
}
