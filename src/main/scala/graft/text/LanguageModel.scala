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
  * vocab selection is a distributed TakeOrderedAndProject with only
  * the v-row result ranked (see Vocab.scala's scale note); scoring
  * is explode → broadcast-vocab
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

  /** Stupid-backoff bigram scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation") — the order-1 step
    * past [[unigramPerplexity]] and the shape of the KenLM-family
    * filters: token i scores by the bigram relative frequency
    * c(w_{i-1} w_i)/c(w_{i-1}) when the bigram is in the pruned
    * model, else by the backed-off unigram 0.4·(c(w_i)/N); the first
    * token of a document scores by its unigram alone. The bigram
    * model keeps the `vb` most frequent bigrams (count-desc,
    * (w1,w2)-asc ties — the Vocab ranking discipline), which is what
    * keeps it broadcastable at any corpus size (production n-gram
    * LMs are pruned for exactly this reason).
    *
    * Determinism: every probability is ratios of exact integers
    * combined in a FIXED expression order — bigram c_b/c_1 is one
    * correctly-rounded division; backoff is 0.4 · (c_u/N), the
    * division first, then one multiply — and each token's surprisal
    * rounds ONCE to integer micro-nats before the order-independent
    * integer sum (the q102 discipline).
    *
    * Scale shape: two corpus-keyed count aggregates (unigrams,
    * bigrams); the bigram pruning is a distributed
    * TakeOrderedAndProject (never a window over the distinct-bigram
    * frame); scoring is one pair-stream explode (built
    * per row from the token array — no window, no self-join) against
    * three broadcast model tables, then one doc-keyed aggregate.
    * Returns (idCol, n_tokens, n_backoff, avg_surprisal, ppl).
    */
  def stupidBackoffPerplexity(df: DataFrame, vb: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(vb > 0, s"bigram vocab size must be positive: $vb")
    val toks = TextAnalysis.tokens(col(textCol))
    // one row per token position: (prev-or-null, token); empty
    // documents are dropped BEFORE the sequence (sequence(1, 0)
    // descends rather than yielding an empty array) — matching
    // unigramPerplexity, where an empty doc explodes to no rows
    val pairs = df.select(col(idCol), toks.as("__ts"))
      .filter(size(col("__ts")) >= 1)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__ts"))),
        i => struct(
          when(i === 1, lit(null).cast("string"))
            .otherwise(element_at(col("__ts"), i - 1)).as("w1"),
          element_at(col("__ts"), i).as("w2")))).as("e"))
      .select(col(idCol), col("e.w1").as("w1"), col("e.w2").as("w2"))
    val uni = pairs.groupBy(col("w2").as("w"))
      .agg(count(lit(1)).as("cu"))
    val nTotal = uni.agg(coalesce(sum(col("cu")), lit(0L))).head().getLong(0)
    // pruned bigram model: top-vb by (cb desc, w1, w2) via a
    // distributed TakeOrderedAndProject — the pruning filter needs no
    // rank column, so the full distinct-bigram frame never sees a
    // window (it would be ≥10^9 rows through one task on web text);
    // denominator c(w1) carried in by a vocab-sized join afterwards
    val big = pairs.filter(col("w1").isNotNull)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      .orderBy(col("cb").desc, col("w1"), col("w2")).limit(vb)
      .join(uni.select(col("w").as("w1"), col("cu").as("c1")), Seq("w1"))
      .select(col("w1"), col("w2"), col("cb"), col("c1"))

    val pUni = col("cu").cast("double") / lit(nTotal).cast("double")
    val p = when(col("w1").isNull, pUni)
      .when(col("cb").isNotNull, col("cb").cast("double") / col("c1").cast("double"))
      .otherwise(lit(0.4) * pUni)
    val scored = pairs
      .join(broadcast(uni), pairs("w2") === uni("w"))
      .join(broadcast(big), Seq("w1", "w2"), "left")
      .select(col(idCol),
        floor(log(p) * lit(-1e6) + lit(0.5)).as("smicro"),
        when(col("w1").isNotNull && col("cb").isNull, lit(1L))
          .otherwise(lit(0L)).as("backoff"))

    val avgSurprisal = sum(col("smicro")).cast("double") /
      count(lit(1)).cast("double") / lit(1e6)
    scored.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      sum(col("backoff")).as("n_backoff"),
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
