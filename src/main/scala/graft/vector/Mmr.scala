package graft.vector

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal-marginal-relevance (MMR) diverse subset selection
  * (Carbonell & Goldstein, SIGIR'98): greedily pick the item
  * maximizing `2·relevance − max_similarity_to_already_picked` — the
  * "k diverse, high-quality exemplars" selection step training-data
  * pipelines run to seed few-shot sets, dedupe prompt banks, or pick
  * representative documents per cluster. Relevance here is affinity
  * to the corpus centroid (the "typical direction"); similarity is
  * the exact integer dot product on the 1e6-quantized grid
  * ([[VectorSearch.quantize]]), so every round's argmax — ties to
  * the smallest id — is bit-reproducible in any engine (the ×2 folds
  * the usual λ=½ trade-off weight into integers; sums stay < 2·10^14
  * at dim 64, far from overflow).
  *
  * Greedy MMR is sequential BY DEFINITION (round r depends on the
  * r−1 picks), so the scale shape is k passes over the corpus, each
  * embarrassingly parallel: per round ONE TakeOrdered(1) scan with
  * the selected vectors folded in as broadcast literals (k·dim
  * longs), no shuffle, no driver-sized collect. The centroid is one
  * map-side-combined position aggregate (`dim` rows survive the
  * shuffle regardless of corpus size; the sum rides DECIMAL(38,0),
  * overflow-free past 10^12 rows).
  *
  * For large k the k-full-corpus-scans shape gets expensive;
  * `candidateN` is the standard practice escape: prefilter to the
  * top-N vectors by relevance (one distributed TakeOrdered) and run
  * exact greedy MMR inside that pool — the N-row candidate frame is
  * then checkpointed, so rounds scan N rows, not the corpus. For
  * N ≥ corpus size the result is IDENTICAL to the exact path (the
  * pool is the whole corpus, and the checkpoint changes nothing but
  * speed); for N < corpus it is the usual approximation contract:
  * every pick comes from the top-N relevance pool, so a
  * diversity-only outlier below the relevance cut cannot be picked
  * (exactly the trade MMR-over-retrieval systems make — the pool IS
  * the retrieval result).
  */
object Mmr {

  /** Top-`k` diverse picks: (rank, vec_id, score) in pick order.
    *
    * @param candidateN 0 = exact over the full corpus (the oracle
    *   face); N ≥ k = greedy MMR restricted to the top-N-by-relevance
    *   candidate pool (identical output when N ≥ corpus size)
    */
  def mmrSelect(emb: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", candidateN: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(candidateN == 0 || candidateN >= k,
      s"Mmr.mmrSelect: candidateN must be 0 (exact) or >= k, got " +
        s"candidateN=$candidateN k=$k")
    val spark = emb.sparkSession
    // deliberately NOT checkpointed/persisted: each round re-derives
    // the quantized frame from the (column-pruned) source scan — a
    // stateless recompute. A corpus-sized localCheckpoint would pin
    // the whole quantized corpus in executor block storage, and an
    // evicted checkpoint block cannot be recomputed (truncated
    // lineage) — a job-killer on a real cluster for k extra scans of
    // savings.
    val q = emb.select(col(idCol).cast("long").as("vec_id"),
      VectorSearch.quantize(col(vecCol)).as("qv"))
    // positional floor-mean (truncating div, matching every engine's
    // integer division on the decimal-carried sum)
    val dim = q.select(size(col("qv"))).limit(1).collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        "Mmr.mmrSelect: empty corpus — nothing to select from"))
      .getInt(0)
    val centroid: Array[Long] = q
      .select(posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(expr("sum(CAST(x AS DECIMAL(38,0))) div count(1)").as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1).map(_._2)
    require(centroid.length == dim, "ragged embedding lengths")
    val relFull = q.withColumn("rel",
      VectorSearch.dot(col("qv"), typedlit(centroid.toSeq)))
    // candidate pool: N-bounded, so the checkpoint is small by
    // construction (unlike the corpus-sized one this operator
    // deliberately avoids — see above)
    val rel =
      if (candidateN == 0) relFull
      else relFull.orderBy(col("rel").desc, col("vec_id"))
        .limit(candidateN).localCheckpoint()
    var selected = List.empty[(Long, Seq[Long], Long)] // id, qv, score
    for (_ <- 1 to k) {
      val score =
        if (selected.isEmpty) col("rel") * 2
        else col("rel") * 2 - selected.map { case (_, sv, _) =>
          VectorSearch.dot(col("qv"), typedlit(sv))
        }.reduceLeft((a, b) => greatest(a, b))
      val picked = rel
        // -1 sentinel keeps the exclusion list non-empty on round 1
        .filter(!col("vec_id").isInCollection(selected.map(_._1) :+ -1L))
        .select(col("vec_id"), col("qv"), score.as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(1).collect().headOption
        .getOrElse(throw new IllegalArgumentException(
          s"Mmr.mmrSelect: k=$k exceeds the " +
            (if (candidateN == 0) "corpus" else s"candidate pool (N=$candidateN)") +
            s" size — exhausted after ${selected.size} picks"))
      selected ::= ((picked.getLong(0),
        picked.getSeq[Long](1).toSeq, picked.getLong(2)))
    }
    val rows = selected.reverse.zipWithIndex.map { case ((id, _, s), i) =>
      Row(i + 1, id, s)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("rank", IntegerType, nullable = false),
        StructField("vec_id", LongType, nullable = false),
        StructField("score", LongType, nullable = false))))
  }
}
