package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN quality evaluation — "measure, don't guess": recall@k of an
  * approximate top-k result against the exact baseline, per query.
  * The acceptance gate every quantized/bucketed index variant
  * (int8, IVF, PQ, RP-LSH) should clear before replacing the exact
  * scan in a pipeline; unit tests pin recall on fixtures, this
  * operator measures it on the corpus at hand.
  *
  * Determinism: membership intersection + exact integer counts +
  * one ppm floor division — bit-identical anywhere.
  *
  * Scale shape: one (query_id, vec_id)-keyed semi-join of two
  * (|Q|·k)-sized result frames and a query-keyed count — everything
  * is result-sized, nothing touches the corpus.
  */
object Eval {

  /** (query_id, hits, recall_ppm) per query of `exact`: how many of
    * the exact top-k ids the approximate result recovered. Both
    * inputs use the (query_id, …, vec_id) result contract of
    * [[VectorSearch]]'s top-k family.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val hits = exact.select(col("query_id"), col("vec_id"))
      .join(approx.select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("recall_ppm", expr(s"(hits * 1000000) div ${k}L"))
      .select(col("query_id"), col("hits"), col("recall_ppm"))
  }
}
