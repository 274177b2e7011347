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

  /** Vocabulary-coverage census per group — "how much of this
    * source's vocabulary have we actually SEEN?", the question
    * behind sizing a tokenizer ([[buildVocab]]'s `v`) and deciding
    * whether a crawl slice is saturated before spending another
    * 10 TB on it. Per group, off the token-frequency census:
    *
    *   - `v_types` observed distinct tokens, `n_tokens` total mass
    *   - `n1`/`n2` singleton/doubleton type counts
    *   - `coverage` — the Good–Turing estimate of the probability
    *     the NEXT token is already known: `(N − n1)/N` (Good 1953;
    *     the unseen-mass estimate is `n1/N`)
    *   - `chao1` — the Chao1 lower-bound estimate of the TRUE
    *     vocabulary size, bias-corrected form
    *     `V + n1·(n1−1)/(2·(n2+1))` (Chao 1984): how far the
    *     tokenizer's long tail actually extends past what we've seen
    *
    * Determinism: all counts are exact integers off one census;
    * `coverage` is ONE correctly-rounded division of exact longs,
    * `chao1` the FIXED IEEE sequence `V + n1·(n1−1) / (2·(n2+1))`
    * (one division, one add — the n1² product rides DECIMAL(38,0)
    * so a 1e9-singleton vocabulary never overflows; the divisor is
    * never zero by construction). An empty group cannot occur (a
    * group exists only via its tokens); a group whose every token is
    * a singleton reports coverage 0.0 honestly.
    *
    * Scale shape: one corpus explode → (group, token) census
    * (map-side combined — THE shuffle), then a group-sized
    * aggregate; nothing corpus-sized moves after the census.
    * Returns one row per group: `(grp, v_types, n_tokens, n1, n2,
    * coverage, chao1)`, ordered by grp.
    */
  def vocabCoverage(df: DataFrame, by: Column,
      textCol: String = "text"): DataFrame =
    vocabCoverageFromCells(
      df.select(by.as("grp"),
          explode(TextAnalysis.tokens(col(textCol))).as("tok"))
        .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("c")))

  /** [[vocabCoverage]] over a pre-built `(grp, tok, c)` census — the
    * SAME census the monitor's token-JSD leg already maintains
    * durably (Divergence.jsdCensus), so a resident monitor gets the
    * saturation report as one more FACE of existing state: additive
    * token counts, drain == batch, no new leg. Same integer counts,
    * same two finishing divisions, one code path.
    */
  def vocabCoverageFromCells(cells: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    cells
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("v_types"), sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("n2"))
      .select(col("grp"), col("v_types"), col("n_tokens"), col("n1"),
        col("n2"),
        ((col("n_tokens") - col("n1")).cast("double") /
          col("n_tokens").cast("double")).as("coverage"),
        (col("v_types").cast("double") +
          (col("n1").cast(dec) * (col("n1") - lit(1L)).cast(dec))
            .cast("double") /
          (lit(2L).cast(dec) * (col("n2") + lit(1L)).cast(dec))
            .cast("double")).as("chao1"))
      .orderBy("grp")
  }
}
