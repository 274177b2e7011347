package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the semantic
  * clustering step of a training-data pipeline (topic balancing,
  * cluster-aware sampling, dataset cartography). The ITERATED
  * counterpart of the zero-iteration sampled centroids that
  * [[VectorSearch.ivfAssign]] and the PQ codebooks use. Not a
  * reference operator: LLM-pipeline extension family.
  *
  * Exactness: all arithmetic is 64-bit integer on the 1e6-quantized
  * grid, SHIFTED by +1e6 so every value is non-negative. The shift
  * makes the centroid update's integer mean (`sum div count`)
  * identical in any engine — floor and truncate-toward-zero divisions
  * agree on non-negative operands, so the floor-vs-truncate mismatch
  * between engines never arises — while squared-L2 distances are
  * translation-invariant, so assignments are those of the unshifted
  * grid. Ties (equal distance) go to the smallest cluster id; the
  * seed order is the (portable Knuth uniform, vec_id) ranking shared
  * with the PQ codebooks. Every step is therefore bit-reproducible
  * and the oracle can replay the identical rounds as a generated SQL
  * CTE chain (the [[graft.text.Bpe]] oracle pattern).
  *
  * Scale shape (100 TB): the corpus is quantized ONCE
  * (localCheckpoint, reused by every round). Per iteration:
  *  - assignment is a zero-shuffle projection — the k centroids are
  *    DRIVER constants (k·d longs, the FAISS codebook shape), and the
  *    arg-min is an `array_min` over k literal-centroid distance
  *    structs, each one native QuantDot; no n×k frame is ever
  *    materialized, no join, no shuffle;
  *  - the update is one posexplode → (cluster, pos) aggregate whose
  *    map-side combine bounds the shuffle at k·d rows per partition,
  *    collected to the driver as the next model.
  * Empty clusters keep their previous centroid (the standard Lloyd
  * convention that needs no re-seeding pass).
  */
object KMeans {
  private val Shift = 1000000L

  /** Final-round assignment of every vector: (idCol, cluster, dist2)
    * after `iters` Lloyd iterations from the Knuth-sampled seeds —
    * dist2 the exact shifted-grid squared L2 to the final centroid.
    * `iters = 0` scores against the seeds themselves.
    */
  def lloydAssign(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    lloydFit(emb, k, iters, idCol, vecCol)
      .select("vec_id", "cluster", "dist2")

  /** [[lloydAssign]] plus the shifted quantized vector `w` each row
    * was clustered on — the input [[semanticDedup]] needs to score
    * within-cluster pairs without a second scan of the corpus.
    */
  private def lloydFit(emb: DataFrame, k: Int, iters: Int,
      idCol: String, vecCol: String): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(iters >= 0, s"iters must be non-negative: $iters")
    // shifted quantized corpus + its squared norm, one pass, reused
    // by every round (n2 makes per-centroid distance a single dot)
    val w = transform(VectorSearch.quantize(col(vecCol)),
      x => x + lit(Shift))
    val c = emb
      .select(col(idCol).as("vec_id"), w.as("w"))
      .withColumn("n2", VectorSearch.norm2(col("w")))
      .localCheckpoint()

    // seeds: the k rows with the smallest portable Knuth uniform
    // (vec_id tiebreak), cluster ids 1..k in that order — the
    // pqCodebooks selection, a TakeOrderedAndProject over one pass
    var cents: Array[(Int, Array[Long])] = c
      .orderBy(graft.ops.Sampler.uniformKnuth(col("vec_id")), col("vec_id"))
      .limit(k)
      .select(col("w")).collect()
      .zipWithIndex
      .map { case (r, i) => (i + 1, r.getSeq[Long](0).toArray) }
    require(cents.length == k,
      s"corpus has only ${cents.length} rows for k=$k seeds")

    // arg-min as array_min over k (dist2, cluster) structs — struct
    // ordering is lexicographic, so equal distances tie to the
    // smallest cluster id; centroids enter as literals, zero shuffle
    def assigned(model: Array[(Int, Array[Long])]): DataFrame = {
      val opts: Array[Column] = model.map { case (cid, cw) =>
        val cn2 = cw.map(x => x * x).sum
        val dist2 = col("n2") - lit(2L) *
          graft.functions.HashExpressions.quantDot(col("w"),
            typedlit(cw.toSeq)) +
          lit(cn2)
        struct(dist2.as("dist2"), lit(cid).as("cluster"))
      }
      c.withColumn("a", array_min(array(opts.toSeq: _*)))
        .select(col("vec_id"), col("w"),
          col("a.cluster").as("cluster"), col("a.dist2").as("dist2"))
    }

    for (_ <- 1 to iters) {
      // componentwise sums per cluster: shuffle bounded at k·d rows
      // per map partition, result k·d rows to the driver
      val sums = assigned(cents)
        .select(col("cluster"), posexplode(col("w")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getInt(0))
      cents = cents.map { case (cid, old) =>
        sums.get(cid) match {
          case Some(rows) =>
            val next = old.clone()
            rows.foreach { r =>
              // non-negative sum div positive count: floor == truncate
              next(r.getInt(1)) = r.getLong(2) / r.getLong(3)
            }
            (cid, next)
          case None => (cid, old) // empty cluster keeps its centroid
        }
      }
    }
    assigned(cents)
  }

  /** SemDeDup-style semantic near-duplicate pruning (Abbas et al.
    * 2023, "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication"): cluster the corpus with [[lloydAssign]]
    * and mark, INSIDE each cluster, every vector whose exact
    * quantized cosine to a lower-id cluster-mate reaches `minCos` —
    * the lower id is the kept representative, the higher id the
    * semantic duplicate. Output one row per vector:
    * (vec_id, cluster, n_dups = lower-id in-cluster neighbors at or
    * above the threshold, kept = 1 iff n_dups = 0).
    *
    * Exactness: assignments come from the bit-reproducible integer
    * Lloyd rounds; pair similarity is the exact integer dot / norms
    * of the UNSHIFTED 1e6-quantized grid (recovered from `w` by the
    * translation, no second quantization pass) with one final double
    * divide + sqrt — the q35 near-dup arithmetic, so the cosine is
    * IEEE-identical in any engine.
    *
    * Scale shape (100 TB): this is WHY SemDeDup clusters first — the
    * all-pairs O(n²) cosine becomes Σ|cluster|² work laid out as ONE
    * equi-join on cluster id (at production scale k grows ∝ n to
    * hold the per-cluster bound, exactly as [[VectorSearch.ivfCells]]
    * scales its cell count). No broadcast of the corpus, no driver
    * materialization; the duplicate counts are a second hash
    * aggregate on the pair stream.
    */
  def semanticDedup(emb: DataFrame, k: Int, iters: Int, minCos: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = lloydFit(emb, k, iters, idCol, vecCol)
      .select(col("vec_id"), col("cluster"),
        transform(col("w"), x => x - lit(Shift)).as("q"))
      .withColumn("n2", VectorSearch.norm2(col("q")))
      .localCheckpoint() // reused by both sides of the pair join
    val a = m.select(col("cluster"), col("vec_id").as("va"),
      col("q").as("qa"), col("n2").as("na"))
    val b = m.select(col("cluster"), col("vec_id").as("vb"),
      col("q").as("qb"), col("n2").as("nb"))
    val dups = a.join(b, Seq("cluster"))
      .filter(col("va") < col("vb"))
      .withColumn("cos", VectorSearch.cosine(
        VectorSearch.dot(col("qa"), col("qb")), col("na"), col("nb")))
      .filter(col("cos") >= minCos)
      .groupBy(col("vb").as("vec_id"))
      .agg(count(lit(1)).as("n_dups"))
    m.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        when(col("n_dups").isNull, lit(1)).otherwise(lit(0)).as("kept"))
  }
}
