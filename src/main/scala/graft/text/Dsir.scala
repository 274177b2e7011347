package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting — Xie et al. 2023 ("Data Selection
  * for Language Models via Importance Resampling") reduced to its
  * deterministic core: score every raw document by the log-likelihood
  * ratio of a target-domain unigram model over the raw-corpus unigram
  * model, so documents that look like the target domain float to the
  * top of the selection order. Not a reference operator: part of the
  * LLM-pipeline extension family (SURVEY §2 extension table), the
  * domain-selection sibling of [[LanguageModel.unigramPerplexity]].
  *
  * Both models share one vocabulary (the `v` most frequent tokens of
  * the FULL corpus — the raw distribution's support, the
  * [[Vocab.buildVocab]] ranking) with add-one smoothing over an OOV
  * bucket: p_m(t) = (cnt_m(t)+1)/(N_m+v+1) where N_m is that model's
  * token total. A token's weight is ln p_target − ln p_raw, rounded
  * ONCE to integer micro-nats (the q102 discipline: each ln is one
  * correctly-rounded double op, the subtraction and the single
  * rounding happen in a FIXED expression order, and the per-doc sum
  * is then exact-integer — associative and partition-order-free).
  *
  * Scale shape (100 TB): two corpus-keyed aggregates (full-corpus
  * token counts = the vocab build, target token counts over the
  * target slice); the merged model is ≤ v rows and BROADCAST, the
  * totals are a broadcast 1-row frame, and scoring is explode →
  * broadcast joins → one doc_id-keyed aggregate. The corpus never
  * shuffles except for those counts and the per-doc sum.
  */
object Dsir {

  /** Importance weights for every document: (idCol, n_tokens,
    * w_micro, avg_logratio, target_like). `w_micro` is the exact
    * integer micro-nat sum of per-token log p_target/p_raw;
    * `avg_logratio` its per-token mean in nats (one division, both
    * engines); `target_like` = 1 when the mean favors the target
    * model — the zero-shuffle stand-in for DSIR's resampling draw
    * (rank-by-weight selection composes with [[graft.ops.Sampler]]).
    *
    * @param targetFilter predicate over `df` rows defining the
    *   target-domain slice the target model is trained on
    */
  def importanceWeights(df: DataFrame, targetFilter: Column, v: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(v > 0, s"vocab size must be positive: $v")
    val tok = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val targetTok = df.filter(targetFilter).select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))

    // raw model = the vocab build itself (full-corpus counts);
    // target counts land on the same vocab rows by broadcast join
    val rawVocab = Vocab.buildVocab(df, v, textCol)
      .select(col("token"), col("cnt").as("cr"))
    val targetCounts = targetTok.groupBy("token")
      .agg(count(lit(1)).as("ct"))
    val model = rawVocab
      .join(targetCounts, Seq("token"), "left")
      .select(col("token"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
    val totals = tok.agg(count(lit(1)).as("n_raw"))
      .crossJoin(targetTok.agg(count(lit(1)).as("n_target")))

    def lnP(cnt: Column, total: Column): Column =
      log(cnt.cast("double") / (total + lit(v.toLong) + lit(1L)).cast("double"))
    // OOV tokens miss the vocab join: both numerators coalesce to 1
    val wMicro = floor(
      (lnP(coalesce(col("ct"), lit(0L)) + lit(1L), col("n_target")) -
        lnP(coalesce(col("cr"), lit(0L)) + lit(1L), col("n_raw"))) *
        lit(1e6) + lit(0.5))

    val scored = tok
      .join(broadcast(model), Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol), wMicro.as("wmicro"))
    scored.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      sum(col("wmicro")).as("w_micro"),
      (sum(col("wmicro")).cast("double") /
        count(lit(1)).cast("double") / lit(1e6)).as("avg_logratio"),
      when(sum(col("wmicro")) > 0, 1).otherwise(0).as("target_like"))
  }
}
