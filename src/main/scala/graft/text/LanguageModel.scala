package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the classic perplexity-based
  * quality filter of a training-data pipeline (documents whose
  * perplexity under a corpus-level unigram model is extreme are
  * boilerplate or garbage; the CCNet/KenLM-style filter reduced to
  * its order-0 form). Not a reference operator: part of the
  * LLM-pipeline extension family (SURVEY §2 extension table), like
  * Vocab/TF-IDF.
  *
  * Model: the `v` most frequent corpus tokens (count-desc, token-asc
  * ties — the [[Vocab.buildVocab]] ranking) with add-one smoothing
  * over an OOV bucket: p(t) = (cnt(t)+1)/(N+v+1), p(OOV) = 1/(N+v+1),
  * where N is the corpus token total. Every probability is a ratio
  * of exact integers, so the doubles are bit-identical in any
  * engine.
  *
  * Determinism under distribution: a document's score is the MEAN of
  * per-token -ln p — a floating sum whose value would depend on
  * partition/merge order. Instead each token's surprisal is rounded
  * ONCE to integer micro-nats (floor(-ln(p)*1e6 + 0.5), a 64-bit
  * long), and the aggregation sums exact integers — associative,
  * order-independent, and it also absorbs any last-ulp disagreement
  * between the engines' ln implementations. The mean and the final
  * exp(..) are then single correctly-rounded double operations
  * written in the same expression order as the SQL oracle.
  *
  * Scale shape (100 TB): one corpus shuffle to count tokens; the
  * vocab ranking runs over the VOCABULARY-sized count frame (see
  * Vocab.scala's scale note); scoring is explode → broadcast-vocab
  * join (+ a broadcast 1-row total) → one doc_id-keyed aggregate.
  * The corpus shuffles twice total (token counts, per-doc agg) and
  * the model itself never exceeds `v` rows.
  */
object LanguageModel {

  /** Score every document against the corpus-trained unigram model.
    * Returns (idCol, n_tokens, n_oov, avg_surprisal, ppl) — mean
    * surprisal in nats and its exp (perplexity), both rounded to
    * 1e-6 by the shared floor form (TextAnalysis.round6 rationale).
    */
  def unigramPerplexity(df: DataFrame, v: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(v > 0, s"vocab size must be positive: $v")
    val tok = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val vocab = Vocab.buildVocab(df, v, textCol).select(col("token"), col("cnt"))
    val totals = tok.agg(count(lit(1)).as("n_total"))

    // p(t) = (cnt+1)/(N+v+1); OOV joins as cnt NULL → numerator 1
    val p = (coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
      (col("n_total") + lit(v.toLong) + lit(1L)).cast("double")
    val scored = tok
      .join(broadcast(vocab), Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        // integer micro-nats: floor(-ln p * 1e6 + 0.5) as a long
        floor(log(p) * lit(-1e6) + lit(0.5)).as("smicro"),
        when(col("cnt").isNull, lit(1L)).otherwise(lit(0L)).as("oov"))

    // exact-integer sum ÷ count ÷ 1e6, in this order on both sides
    val avgSurprisal = sum(col("smicro")).cast("double") /
      count(lit(1)).cast("double") / lit(1e6)
    scored.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      sum(col("oov")).as("n_oov"),
      avgSurprisal.as("avg_surprisal"),
      (floor(exp(avgSurprisal) * lit(1e6) + lit(0.5)).cast("double") /
        lit(1e6)).as("ppl"))
  }

  /** CCNet-style perplexity bucketing: every document scored by
    * [[unigramPerplexity]] and split per group (language, in CCNet)
    * into `buckets` equal-size quantile bands by NTILE — bucket 1 is
    * "head" (lowest perplexity, most in-distribution), the last is
    * "tail" (Wenzek et al. 2020 keep head+middle and drop or
    * downweight tail). Returns (idCol, groupCol, n_tokens,
    * avg_surprisal, ppl, bucket, bucket_name).
    *
    * Determinism: NTILE runs on (avg_surprisal, id) — avg_surprisal
    * is one correctly-rounded division of the exact integer
    * micro-nat sum on both engines, and the id tiebreak pins
    * documents with identical token multisets to one order.
    *
    * Scale shape: the scoring cost is [[unigramPerplexity]]'s; the
    * bucketing adds ONE group-keyed shuffle of the doc-sized score
    * frame. Group cardinality (languages) is small, so the window
    * sort is the per-group doc count — for skewed corpora the NTILE
    * boundary could be replaced by approx quantile cutpoints, but
    * exact NTILE keeps the oracle contract bit-exact.
    */
  def perplexityBuckets(df: DataFrame, v: Int, buckets: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      groupCol: String = "lang"): DataFrame = {
    require(buckets > 1, s"buckets must be > 1: $buckets")
    val scored = unigramPerplexity(df, v, idCol, textCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("avg_surprisal"), col(idCol))
    df.select(col(idCol), col(groupCol))
      .join(scored, Seq(idCol))
      .withColumn("bucket", ntile(buckets).over(w))
      .withColumn("bucket_name",
        when(col("bucket") === 1, lit("head"))
          .when(col("bucket") === buckets, lit("tail"))
          .otherwise(lit("middle")))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        col("avg_surprisal"), col("ppl"), col("bucket"), col("bucket_name"))
  }
}
