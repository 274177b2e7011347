package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-vocabulary construction and document id-encoding — the
  * tokenizer-prep step of a training pipeline: fix a vocabulary of
  * the `v` most frequent tokens, then rewrite every document as the
  * sequence of its token ids (0 = out-of-vocabulary).
  *
  * Scale shape: the corpus shuffles once to count tokens; the
  * ranking window runs over the VOCABULARY-sized count frame (a
  * single-partition exchange of distinct tokens, not rows — at
  * 100 TB of text the distinct-token frame is still merely millions
  * of rows, and id assignment is inherently a total order).
  * Encoding is an explode + broadcast-vocab join + per-doc
  * re-assembly: one shuffle on doc_id, vocab never shuffles.
  */
object Vocab {

  /** The `v` most frequent tokens, ranked 1..v by (count desc,
    * token) — the tie order makes ids reproducible anywhere.
    * Returns (token, cnt, id).
    */
  def buildVocab(df: DataFrame, v: Int, textCol: String = "text"): DataFrame = {
    require(v > 0, s"vocab size must be positive: $v")
    val counts = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    // vocabulary-sized total order — see the scale note above
    counts
      .withColumn("id", row_number().over(
        Window.orderBy(col("cnt").desc, col("token"))))
      .filter(col("id") <= v)
  }

  /** Encode each document against `vocab` (from [[buildVocab]]):
    * space-joined token-id sequence in original token order, id 0
    * for out-of-vocabulary tokens, plus token/OOV counts. Empty
    * documents yield an empty id string, not a dropped row.
    */
  def encodeDocuments(df: DataFrame, vocab: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = df.select(col(idCol),
      posexplode_outer(TextAnalysis.tokens(col(textCol)))
        .as(Seq("pos", "token")))
    tok.join(broadcast(vocab.select(col("token"), col("id"))),
        Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        // re-assemble in token order: sort (pos, id) structs by pos
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("pos").isNotNull,
            struct(col("pos"), coalesce(col("id"), lit(0)).as("tid"))))),
          s => s("tid").cast("string"))).as("ids"),
        count(col("pos")).as("n_tokens"),
        sum(when(col("pos").isNotNull && col("id").isNull, 1L)
          .otherwise(0L)).as("n_oov"))
  }
}
