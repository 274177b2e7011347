package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-entity event
  * sequences — the behavioral-model summary every event pipeline
  * derives next to funnels and retention (what follows what, and
  * with which probability). The reference replays raw event streams
  * into current-state tables (datamigrator.py in /root/reference);
  * this summarizes the sequence structure those replays traverse.
  *
  * Determinism: sequences are totally ordered by (ts, tie), counts
  * are exact integers, and the transition probability is integer ppm
  * (`cnt·10^6 div row_total`) — floor division, bit-identical in any
  * engine.
  *
  * Scale shape: ONE hash shuffle on the entity key feeds the
  * lag() window; the (prev, next) count aggregate is map-side
  * combined to alphabet² cardinality; the per-prev row total is a
  * window over that alphabet-sized frame. Nothing node- or
  * corpus-sized is broadcast or collected.
  */
object Markov {

  /** (prev, next, cnt, p_ppm) for every observed transition of
    * `eventCol` within a `keyCol` sequence ordered by
    * (`tsCol`, `tieCol`); `p_ppm` is row-normalized per `prev`.
    */
  def transitionMatrix(df: DataFrame, keyCol: Column, eventCol: Column,
      tsCol: Column, tieCol: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    val pairs = df
      .withColumn("__prev", lag(eventCol, 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("__prev").as("prev"), eventCol.as("next"))
    pairs.groupBy(col("prev"), col("next")).agg(count(lit(1)).as("cnt"))
      .withColumn("__tot", sum(col("cnt")).over(Window.partitionBy(col("prev"))))
      .select(col("prev"), col("next"), col("cnt"),
        expr("(cnt * 1000000) div __tot").as("p_ppm"))
  }
}
