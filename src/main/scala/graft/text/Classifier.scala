package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes document classification — the linear
  * bag-of-words classifier of the fastText-supervised family, the
  * standard cheap quality/domain tagger of a training-data pipeline
  * (CCNet's language filter, RedPajama's domain classifiers). Not a
  * reference operator: part of the LLM-pipeline extension family
  * (SURVEY §2 extension table).
  *
  * Model: per class c, an add-one-smoothed unigram over the shared
  * top-`v` corpus vocabulary — p(t|c) = (cnt_c(t)+1)/(N_c+v+1) with
  * an OOV bucket, prior p(c) = docs_c/docs. A document's class score
  * is ln p(c) + Σ ln p(t|c); each ln is rounded ONCE to integer
  * micro-nats (the q102 discipline) so the per-(doc, class) sum is
  * exact-integer and partition-order-free, and the argmax is the
  * deterministic (score desc, class asc) order.
  *
  * Scale shape (100 TB): the model is (v · #classes) rows plus a
  * #classes-row totals frame — both BROADCAST; scoring is explode →
  * a #classes-wide broadcast expansion (a small constant, e.g. 5
  * languages) → one (doc, class)-keyed aggregate → a #classes-deep
  * per-doc argmax window. The corpus shuffles for the model counts
  * and the per-doc aggregate only; no corpus-sized frame is ever
  * joined to another corpus-sized frame.
  */
object Classifier {

  /** Train-and-apply in one pass (self-classification — the
    * held-out-split variant composes with
    * [[graft.dedup.Dedup.leakageSafeSplit]]). Returns one row per
    * non-empty document: (idCol, classCol, predicted, score_micro,
    * correct) where `score_micro` is the winning class's exact
    * integer micro-nat log-posterior and `correct` flags
    * predicted == actual.
    */
  def naiveBayes(df: DataFrame, classCol: String, v: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(v > 0, s"vocab size must be positive: $v")
    val tok = df.select(col(idCol), col(classCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val vocab = Vocab.buildVocab(df, v, textCol).select("token")

    // per-class model: token counts restricted to the shared vocab,
    // class token totals over ALL tokens, document-count priors
    val classTok = tok.select(col(classCol).as("cls"), col("token"))
    val counts = classTok.join(broadcast(vocab), Seq("token"))
      .groupBy(col("cls"), col("token")).agg(count(lit(1)).as("cw"))
    val classTotals = classTok.groupBy(col("cls"))
      .agg(count(lit(1)).as("nc"))
    val priors = df.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("docs_c"))
    val nDocs = df.count()
    val priorMicro = priors.select(col("cls"),
      floor(log(col("docs_c").cast("double") / lit(nDocs.toDouble)) *
        lit(1e6) + lit(0.5)).as("prior_micro"))

    // every token scores against every class: a #classes-wide
    // broadcast expansion, then the vocab-hit count joins in
    val classes = classTotals.select(col("cls"), col("nc"))
    val tokMicro = floor(
      log((coalesce(col("cw"), lit(0L)) + lit(1L)).cast("double") /
        (col("nc") + lit(v.toLong) + lit(1L)).cast("double")) *
        lit(1e6) + lit(0.5))
    val scored = tok
      .crossJoin(broadcast(classes))
      .join(broadcast(counts), Seq("cls", "token"), "left")
      .select(col(idCol), col(classCol), col("cls"), tokMicro.as("tmicro"))
      .groupBy(col(idCol), col(classCol), col("cls"))
      .agg(sum(col("tmicro")).as("tok_micro"))
      .join(broadcast(priorMicro), Seq("cls"))
      .select(col(idCol), col(classCol), col("cls"),
        (col("tok_micro") + col("prior_micro")).as("score_micro"))

    val argmax = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("cls"))
    scored
      .withColumn("__rn", row_number().over(argmax))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(classCol), col("cls").as("predicted"),
        col("score_micro"),
        when(col("cls") === col(classCol), 1).otherwise(0).as("correct"))
  }
}
