package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Token-vocabulary construction and document id-encoding — the
  * tokenizer-prep step of a training pipeline: fix a vocabulary of
  * the `v` most frequent tokens, then rewrite every document as the
  * sequence of its token ids (0 = out-of-vocabulary).
  *
  * Scale shape: the corpus shuffles once to count tokens; the top-v
  * selection is a distributed TakeOrderedAndProject over the
  * distinct-token count frame (per-partition top-v, merged at the
  * driver — the 10^8–10^9-unigram frame of a web-scale corpus is
  * never funneled through one task), and id assignment ranks the
  * v-row RESULT on the driver — the vocabulary IS driver-state, the
  * same model-sized budget as BPE merge tables and k-means
  * centroids, and it re-enters the cluster as a broadcast local
  * relation. Encoding is an explode + broadcast-vocab join + per-doc
  * re-assembly: one shuffle on doc_id, vocab never shuffles.
  */
object Vocab {

  /** The `v` most frequent tokens, ranked 1..v by (count desc,
    * token) — the tie order makes ids reproducible anywhere.
    * Returns (token, cnt, id).
    */
  def buildVocab(df: DataFrame, v: Int, textCol: String = "text"): DataFrame = {
    require(v > 0, s"vocab size must be positive: $v")
    // top-v first (TakeOrderedAndProject — never a global window over
    // the corpus-distinct-token frame; Catalyst folds any constant
    // window partition key right back onto WindowExec's
    // single-partition path, so no window form survives here), THEN
    // rank the v-row result on the driver. Eager by design: the
    // vocabulary is a model, and every consumer broadcasts it.
    val spark = df.sparkSession
    val top = topTokenCounts(df, v, textCol)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }
    val rows: java.util.List[Row] = java.util.Arrays.asList(
      top.zipWithIndex.map { case ((t, c), i) => Row(t, c, i + 1) }: _*)
    // a TRUE LocalRelation (accurate tiny stats — consumers that
    // forget the broadcast hint still plan a broadcast join; an
    // RDD-backed frame would report defaultSizeInBytes and force a
    // corpus-sized sort-merge join on them)
    spark.createDataFrame(rows,
      StructType(Seq(StructField("token", StringType, nullable = true),
        StructField("cnt", LongType, nullable = false),
        StructField("id", IntegerType, nullable = false))))
  }

  /** The lazy top-v count frame (token, cnt) feeding [[buildVocab]]
    * — the distributed TakeOrderedAndProject whose plan shape the
    * NewOpPlanShapesSpec pins.
    */
  private[graft] def topTokenCounts(df: DataFrame, v: Int,
      textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(v)

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
