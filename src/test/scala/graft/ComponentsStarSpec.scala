package graft

import graft.dedup.Dedup
import graft.ops.ConnectedComponents
import graft.text.Collocations
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ComponentsStarSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star components equal label propagation on a random pair graph") {
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 120).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
      .toDF("doc_a", "doc_b")
    val star = labelsOf(ConnectedComponents.starComponents(pairs))
    val prop = labelsOf(Dedup.dupClusters(pairs))
    assert(star == prop)
  }

  test("star components collapse a long chain in logarithmic rounds") {
    // a 400-node path: diameter 399 — min-label propagation's worst
    // case (its default 30-round budget cannot finish) — while the
    // star contraction's geometric progress fits maxIter 50 easily
    val n = 400L
    val chain = (0L until n - 1).map(i => (i + 1000L, i + 1001L))
      .toDF("doc_a", "doc_b")
    val got = labelsOf(ConnectedComponents.starComponents(chain, maxIter = 50))
    assert(got.keySet == (1000L until 1000L + n).toSet)
    assert(got.values.toSet == Set(1000L))
  }

  test("star components are partitioning-independent and handle empties") {
    val pairs = Seq((5L, 9L), (9L, 2L), (30L, 40L), (40L, 30L), (7L, 7L))
      .toDF("doc_a", "doc_b")
    val a = labelsOf(ConnectedComponents.starComponents(pairs.repartition(7)))
    val b = labelsOf(ConnectedComponents.starComponents(pairs.repartition(1)))
    assert(a == b)
    assert(a == Map(5L -> 2L, 9L -> 2L, 2L -> 2L, 30L -> 30L, 40L -> 30L))
    val empty = ConnectedComponents.starComponents(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
    assert(empty.count() == 0)
  }

  test("star rounds cost one job each: the checksum rides the checkpoint") {
    // AQE off and broadcast off so one action == exactly one job —
    // job accounting is then exact: 1 initial checkpoint + R round
    // checkpoints (checksum observed in the SAME job) + 1 star-
    // invariant guard = R + 2 jobs total
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val chain = (0L until 32L).map(i => (i + 100L, i + 101L))
        .toDF("doc_a", "doc_b")
      // learn the loop's round count R by replaying the contraction
      // outside the measured window (set equality == the checksum)
      var cur = chain.select(greatest($"doc_a", $"doc_b").as("u"),
          least($"doc_a", $"doc_b").as("v"))
        .filter($"u" =!= $"v").distinct().localCheckpoint()
      def edgeSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      var curSet = edgeSet(cur)
      var rounds = 0
      var done = false
      while (!done) {
        val nxt = ConnectedComponents.smallStar(
          ConnectedComponents.largeStar(cur)).localCheckpoint()
        val s = edgeSet(nxt)
        done = s == curSet
        curSet = s
        cur = nxt
        rounds += 1
      }
      val sc = spark.sparkContext
      sc.setJobGroup("star-jobs", "job accounting")
      try ConnectedComponents.starComponents(chain)
      finally sc.clearJobGroup()
      // the status store fills asynchronously: poll until stable
      def count = sc.statusTracker.getJobIdsForGroup("star-jobs").length
      var last = -1
      var stable = 0
      while (stable < 5) {
        val c = count
        if (c == last) stable += 1 else { stable = 0; last = c }
        Thread.sleep(100)
      }
      assert(last == rounds + 2,
        s"expected ${rounds + 2} jobs ($rounds rounds + init + guard), got $last")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("star components equal union-find across many random graph shapes") {
    // brute-force reference: path-compressed union-find with min roots
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.map(n => n -> find(n)).toMap
    }
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val n = 20 + rnd.nextInt(60)
      val m = rnd.nextInt(3 * n)
      val edges = (1 to m).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val got = labelsOf(ConnectedComponents.starComponents(
          edges.toDF("doc_a", "doc_b")))
        assert(got == unionFind(edges), s"seed=$seed n=$n m=$m")
      }
    }
  }

  test("k-core equals brute-force peeling across random graphs") {
    def brutePeel(edges: Set[(Long, Long)], k: Int): Map[Long, Int] = {
      var e = edges
      var stable = false
      while (!stable) {
        val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val next = e.filter(p => keep(p._1) && keep(p._2))
        stable = next == e
        e = next
      }
      e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).view.mapValues(_.size).toMap
    }
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(100 + seed)
      val n = 15 + rnd.nextInt(30)
      val edges = (1 to 4 * n).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.max(a, b), math.min(a, b)) }.toSet
      val k = 2 + rnd.nextInt(4)
      val got = graft.ops.KCore.kCore(edges.toSeq.toDF("a", "b"), k)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(got == brutePeel(edges, k), s"seed=$seed n=$n k=$k")
    }
  }

  test("pmi bigrams match a plain-Scala computation") {
    val docs = Seq(
      "fast car fast car fast car fast car fast car",
      "slow boat slow boat slow boat slow boat slow boat",
      "fast boat slow car fast boat slow car fast boat",
      "car car car car car boat boat boat boat boat").toDF("text")
    val got = Collocations.pmiBigrams(docs, minCount = 2L, topK = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getLong(2), r.getAs[Number](3).longValue)).toList

    val texts = docs.as[String].collect()
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bi = scala.collection.mutable.Map.empty[(String, String), Long]
    for (t <- texts) {
      val ws = t.split("\\s+").filter(_.nonEmpty)
      ws.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      ws.sliding(2).foreach {
        case Array(a, b) => bi((a, b)) = bi.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    val nTot = uni.values.sum
    val want = bi.toList.filter(_._2 >= 2).map { case ((a, b), c) =>
      ((a, b), c,
        (BigInt(c) * nTot * 1000000 / (BigInt(uni(a)) * uni(b))).toLong)
    }.sortBy { case ((a, b), _, s) => (-s, a, b) }.take(10)
    assert(got == want)
  }

  test("containment finds an excerpt that Jaccard misses") {
    // doc 2 = a 6-token excerpt of the 40-token doc 1: containment of
    // 2 in 1 is 1.0 while J ~ 0.1 — and only that orientation passes
    val big = (1 to 36).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, big),
      (2L, (10 to 15).map(i => s"w$i").mkString(" ")),
      (3L, "x1 x2 x3 x4 x5 x6 x7")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, k = 3, thresholdPpm = 800000L,
        maxDF = Dedup.UncappedMaxDF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toList
    assert(got == List((2L, 1L, 1000000L)))
    val j = Dedup.jaccardPairs(docs, k = 3, threshold = 0.5,
      maxDF = Dedup.UncappedMaxDF)
    assert(j.count() == 0, "resemblance Jaccard must miss the excerpt")
  }
}
