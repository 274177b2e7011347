package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval — the lexical ranking function behind
  * every classic search stack (Lucene/Elasticsearch defaults) and
  * the standard "hard-negative mining / retrieval baseline" operator
  * of a training-data pipeline: given a handful of term queries,
  * return the top-k highest-scoring documents per query. Not a
  * reference operator: LLM-pipeline extension family (SURVEY §2
  * extension table), the retrieval counterpart of TF-IDF (q82).
  *
  * Model (Lucene's non-negative idf variant):
  * {{{
  *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   norm(d) = 1 - b + b * dl / avgdl
  *   score   = Σ_t idf(t) * tf·(k1+1) / (tf + k1·norm)
  * }}}
  * with the standard k1 = 1.2, b = 0.75.
  *
  * Determinism under distribution (the [[LanguageModel]] micro-nats
  * discipline): `idf` is the only transcendental — it is rounded
  * ONCE to integer micro-nats per term; every other factor is a
  * chain of correctly-rounded IEEE basic ops on exact integers
  * written in the same order as the SQL oracle, and each (doc, term)
  * contribution is rounded ONCE to an integer micro-score so the
  * per-(query, doc) aggregation sums exact longs — associative and
  * order-independent. Output scores stay in integer micro units.
  *
  * Scale shape (100 TB): the corpus explodes once and pays ONE
  * shuffle keyed on the document id (the per-doc length aggregate);
  * postings are filtered to the query-term set AT THE SCAN (a
  * literal `isin` prune — the inverted-index seek of a search
  * engine, so tf aggregation shuffles only the matching tail); the
  * df/idf table is at most |distinct query terms| rows and
  * broadcasts, as do the 1-row corpus totals and the query list
  * itself; the final top-k per query is a literal-bound rank →
  * WindowGroupLimit (partial top-k below the shuffle), never a
  * global sort.
  */
object Bm25 {

  /** Score `queries` (id → bag of terms) against the corpus and keep
    * the top `k` documents per query. Returns
    * (query_id, rnk, idCol, score_micro) — score in integer
    * micro-nat-scaled units (1e-6), rank dense within query by
    * (score desc, idCol asc).
    */
  def topK(docs: DataFrame, queries: Seq[(Int, Seq[String])], k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(queries.nonEmpty, "at least one query")
    val spark = docs.sparkSession
    import spark.implicits._

    val terms = queries.flatMap(_._2).distinct
    val qdf = broadcast(
      queries.flatMap { case (qid, ts) => ts.distinct.map(qid -> _) }
        .toDF("query_id", "token"))

    val tok = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    // per-doc length: the one corpus-wide shuffle, keyed on the doc
    val dl = tok.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    // inverted-index seek: only query-term postings survive the scan
    val tf = tok.filter(col("token").isin(terms.map(lit): _*))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))

    // corpus totals (1 row) and per-term df/idf (≤ |terms| rows)
    val totals = docs.agg(count(lit(1)).as("n_docs"))
    val tTotal = tok.agg(count(lit(1)).as("t_total"))
    val idf = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(totals))
      // micro-nat idf: floor(ln(1 + (N-df+0.5)/(df+0.5))·1e6 + 0.5);
      // the ratio is exact-integer arithmetic so ln sees the same
      // double in any engine, and the single rounding absorbs
      // last-ulp ln disagreement
      .select(col("token"),
        floor(log(lit(1.0) +
          ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) * lit(1e6) + lit(0.5))
          .as("idf_micro"))

    // avgdl enters as the same double on both sides: T/N, one divide
    val contrib = tf
      .join(broadcast(idf), Seq("token"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(totals)).crossJoin(broadcast(tTotal))
      .join(qdf, Seq("token"))
      .select(col("query_id"), col(idCol), {
        val avgdl = col("t_total").cast("double") / col("n_docs").cast("double")
        val norm = lit(1.0) - lit(0.75) +
          lit(0.75) * col("dl").cast("double") / avgdl
        val sat = col("tf").cast("double") * lit(2.2) /
          (col("tf").cast("double") + lit(1.2) * norm)
        // one more rounding: the (doc, term) contribution becomes an
        // exact long so the score sum is order-independent
        floor(col("idf_micro").cast("double") * sat + lit(0.5))
          .as("c_micro")
      })

    val scored = contrib.groupBy(col("query_id"), col(idCol))
      .agg(sum(col("c_micro")).as("score_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col(idCol))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col(idCol), col("score_micro"))
  }
}
