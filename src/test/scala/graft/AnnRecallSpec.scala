package graft

import graft.vector.{Eval, VectorSearch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-8 ANN additions: the RP-LSH top-k
  * index, the portable (Knuth-sampled) IVF centroid path, and the
  * recall evaluator's missing-query accounting — the same planted-
  * fixture + plan-pin + measured-floor discipline the other index
  * variants carry (PipelineSpec's q97/q28 suites).
  */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def plantedCorpus() = {
    // 40 random base vectors plus two exact twins: an identical
    // vector shares every signature slice / IVF cell / PQ code with
    // its twin, so each index family MUST surface it
    val rnd = new scala.util.Random(13)
    val rows = (0L until 40L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val twins = Seq((100L, rows(3)._2), (101L, rows(3)._2),
      (200L, rows(7)._2), (201L, rows(7)._2))
    (rows ++ twins).toDF("vec_id", "embedding")
  }

  test("rpLshTopK: planted twins rank first, bucketed plan, WindowGroupLimit") {
    val emb = plantedCorpus()
    val queries = emb.filter($"vec_id".isin(100L, 200L))
    val r = VectorSearch.rpLshTopK(emb, queries, k = 3, nbits = 32, chunks = 4)
    val top1 = r.filter($"rnk" === 1).collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.getDouble(3))).toMap
    // an identical twin has Hamming-0 signatures → shares all 4
    // slices → is always a candidate, and exact cosine 1.0 wins.
    // (3 ranks first for query 100: cos(100,3)=1.0 too and 3 < 101.)
    assert(top1(100L)._2 == 1.0 && Set(3L, 101L)(top1(100L)._1), s"$top1")
    assert(top1(200L)._2 == 1.0 && Set(7L, 201L)(top1(200L)._1), s"$top1")
    val plan = r.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "RP-LSH top-k must stay slice-bucketed")
    assert(plan.contains("WindowGroupLimit"),
      "per-query top-k must plan as a partial top-k")
    // self-exclusion: a query never returns itself
    assert(r.filter($"query_id" === $"vec_id").count() == 0)
  }

  test("rpLshTopK is deterministic across runs and input partitioning") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(pmod($"vec_id", lit(100)) === 0)
    def run(c: org.apache.spark.sql.DataFrame) =
      VectorSearch.rpLshTopK(c, q, k = 10, nbits = 32, chunks = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
    val a = run(emb)
    assert(a == run(emb.repartition(7)), "partitioning must not change top-k")
    assert(a.nonEmpty)
  }

  test("ann recall floors at sf0.001: measured, not guessed") {
    // the corpus is random (clusterless), so lossy-index recall is
    // structurally modest — these floors pin the MEASURED value so a
    // regression in bucketing/probing/encoding shows up as a drop
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(pmod($"vec_id", lit(100)) === 0)
    val exact = VectorSearch.bruteForceTopK(emb, q, k = 10).localCheckpoint()
    def meanRecallPpm(approx: org.apache.spark.sql.DataFrame): Long =
      Eval.recallAtK(exact, approx, k = 10)
        .agg(avg($"recall_ppm")).head().getDouble(0).toLong
    val ivf = meanRecallPpm(VectorSearch.ivfTopK(emb, q, k = 10, nprobe = 2,
      numCells = 32, portableSample = true))
    val pq = meanRecallPpm(VectorSearch.pqTopK(emb, q, k = 10))
    val lsh = meanRecallPpm(VectorSearch.rpLshTopK(emb, q, k = 10,
      nbits = 32, chunks = 4))
    // measured on this fixture (deterministic — no RNG anywhere):
    // ivf=280000, pq=140000, lsh=180000; floors sit just below so a
    // testdata regeneration wiggles but a real regression fails
    info(s"measured mean recall_ppm: ivf=$ivf pq=$pq lsh=$lsh")
    assert(ivf >= 250000L, s"IVF nprobe=2 mean recall_ppm dropped: $ivf")
    assert(pq >= 100000L, s"PQ m=4 mean recall_ppm dropped: $pq")
    assert(lsh >= 150000L, s"RP-LSH 32/4 mean recall_ppm dropped: $lsh")
  }

  test("knuthCentroids matches the plain-Scala portable formula, deterministically") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val c = VectorSearch.prepared(emb)
    val got = VectorSearch.knuthCentroids(c, 32).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
    // the SQL-expressible selection: smallest ((id*K) mod 2^32, id)
    val ids = emb.select($"vec_id").collect().map(_.getLong(0))
    def uk(id: Long): Long = {
      val a = java.lang.Math.floorMod(id, 1L << 32)
      val ah = a >> 16
      val al = a & 0xFFFFL
      (((ah * 2654435761L) % 65536L) * 65536L + al * 2654435761L) %
        (1L << 32)
    }
    val want = ids.sortBy(id => (uk(id), id)).take(32).toSeq
    assert(got.map(_._1).toSeq == want,
      "centroid cells must be the 32 smallest (knuth, id) corpus ids")
    // payloads carry the member's own quantized vector and exact norm
    val qmap = c.collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    got.foreach { case (cell, cq, cn2) =>
      assert((cq, cn2) == qmap(cell), s"cell $cell payload mismatch") }
    // second invocation selects the identical set (no RNG anywhere)
    assert(VectorSearch.knuthCentroids(c, 32).collect()
      .map(_.getLong(0)).toSeq == want)
  }

  test("ivfTopK portableSample with exhaustive probing equals brute force") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(pmod($"vec_id", lit(100)) === 0)
    val brute = VectorSearch.bruteForceTopK(emb, q, 10).collect().toSet
    val ivf = VectorSearch.ivfTopK(emb, q, 10, nprobe = 1000,
      portableSample = true).collect().toSet
    assert(ivf == brute)
  }

  test("recallAtK charges queries the approximate index missed entirely") {
    // an RP-LSH query sharing no slice with any corpus vector yields
    // zero result rows — the evaluator must still report it at 0, not
    // silently drop it (the empty-bucket accounting contract)
    val exact = Seq((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 20L), (2L, 2, 21L))
      .toDF("query_id", "rnk", "vec_id")
    val approx = Seq((1L, 1, 10L), (1L, 2, 99L))
      .toDF("query_id", "rnk", "vec_id")
    val r = Eval.recallAtK(exact, approx, k = 2).orderBy("query_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 1L, 500000L), (2L, 0L, 0L)))
  }

  test("integerHits nodeCount hint saves exactly the count job, output bit-exact") {
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (0L until 200L).map(i => (i, (i * 7) % 50))
        .toDF("src", "dst")
      val sc = spark.sparkContext
      def measured(group: String)(body: => Array[(Long, Long, Long)]) = {
        sc.setJobGroup(group, "hits job accounting")
        val out = try body finally sc.clearJobGroup()
        def count = sc.statusTracker.getJobIdsForGroup(group).length
        var last = -1
        var stable = 0
        while (stable < 5) {
          val c = count
          if (c == last) stable += 1 else { stable = 0; last = c }
          Thread.sleep(100)
        }
        (last, out)
      }
      def collectHits(nodeCount: Long) = graft.ops.Hits
        .integerHits(edges, iters = 2, nodeCount = nodeCount)
        .orderBy("node").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val (jDefault, outDefault) = measured("hits-count")(collectHits(-1L))
      // the hint path must skip the node-count job and nothing else
      val (jHint, outHint) = measured("hits-hint")(collectHits(1000L))
      assert(outHint.toSeq == outDefault.toSeq,
        "hint must not change the result")
      assert(jDefault - jHint == 1,
        s"hint must save exactly the count job: $jDefault vs $jHint")
      // a stale count that flips the regime still matches bit-exactly
      val (_, outSharded) = measured("hits-stale")(collectHits(1L << 40))
      assert(outSharded.toSeq == outDefault.toSeq,
        "regime flip must stay bit-exact")
      // negatives other than the -1 sentinel are rejected, not
      // silently treated as "count the frame"
      val e = intercept[IllegalArgumentException] {
        graft.ops.Hits.integerHits(edges, iters = 2, nodeCount = -2L)
      }
      assert(e.getMessage.contains("nodeCount"))
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }
}
