package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way a
  * curation pipeline combines incommensurable quality signals
  * (perplexity, a heuristic score, a classifier margin) into one
  * selection order without calibrating any of them: each signal
  * contributes `1/(k + rank)` and only the RANKS matter, so an
  * outlier score cannot dominate the fusion the way a weighted sum
  * lets it.
  *
  * Determinism: contributions are exact integers —
  * `1000000 div (k + rank)` — summed as integers, and every rank is
  * a ROW_NUMBER over the (signal, id) key, so identical-signal ties
  * resolve identically in any engine. No float appears anywhere.
  *
  * Scale shape: one window per signal, each partitioned by
  * `groupCol` (ranking within language/source strata, the CCNet
  * arrangement) — the per-partition sort is the per-group doc count,
  * and the frame carries only (id, group, signals), not text. A
  * GLOBAL fusion (no strata) would be a single-partition sort; keep
  * a stratum column for corpus-scale runs, exactly like the q115
  * bucketing.
  */
object RankFusion {

  /** Fuse `signals` — (column, ascendingIsBetter) pairs — into
    * `rrf_micro`, adding one `rank_<col>` column per signal.
    * Better = rank 1. Ties break on `idCol` ascending.
    */
  def fuse(df: DataFrame, idCol: String, groupCol: String,
      signals: Seq[(String, Boolean)], k: Int = 60): DataFrame = {
    require(signals.nonEmpty, "need at least one signal to fuse")
    require(k >= 1, s"rrf k must be >= 1: $k")
    var out = df
    val rankCols = signals.map { case (c, asc) =>
      val w = Window.partitionBy(col(groupCol))
        .orderBy(if (asc) col(c).asc else col(c).desc, col(idCol).asc)
      val rc = s"rank_$c"
      out = out.withColumn(rc, row_number().over(w))
      rc
    }
    val rrf = rankCols
      .map(rc => expr(s"CAST(1000000 div ($k + $rc) AS BIGINT)"))
      .reduce(_ + _)
    out.withColumn("rrf_micro", rrf)
  }
}
