package graft

import graft.ops.{Cusum, LabelProp, Markov, RobustStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force replays for the round-7 operators: character entropy,
  * Markov transitions, CUSUM drift, seeded label propagation, and
  * median/MAD outliers.
  */
class NewOps7Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("charEntropy: hand-computed distribution, empty docs drop, partition-stable") {
    // "aabb": p(a)=p(b)=1/2 → entropy = ln 2; "abcd": ln 4
    val docs = Seq((1L, "aabb"), (2L, "abcd"), (3L, "")).toDF("doc_id", "text")
    def micro(p: Double): Long = math.floor(-math.log(p) * 1e6 + 0.5).toLong
    val got = graft.text.TextAnalysis.charEntropy(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L), "empty doc must drop")
    val e1 = (2 * micro(0.5) + 2 * micro(0.5)).toDouble / 4.0 / 1e6
    val e2 = (4 * micro(0.25)).toDouble / 4.0 / 1e6
    assert(got.toSeq == Seq((1L, 4L, 2L, e1), (2L, 4L, 4L, e2)))
    val re = graft.text.TextAnalysis.charEntropy(docs.repartition(7))
      .collect().map(r => (r.getLong(0), r.getDouble(3))).sortBy(_._1)
    assert(re.toSeq == got.map(x => (x._1, x._4)).toSeq)
  }

  test("markov transitions: hand counts, ppm floors, first events excluded") {
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000)
    val events = Seq(
      (1L, ts(1), "view", 1L), (1L, ts(2), "cart", 2L), (1L, ts(3), "view", 3L),
      (2L, ts(1), "view", 4L), (2L, ts(2), "view", 5L), (2L, ts(3), "cart", 6L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = Markov.transitionMatrix(events, col("user_id"),
        col("event_type"), col("ts"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sortBy(x => (x._1, x._2))
    // from view: cart 2, view 1 (total 3); from cart: view 1 (total 1)
    assert(got.toSeq == Seq(
      ("cart", "view", 1L, 1000000L),
      ("view", "cart", 2L, 666666L),
      ("view", "view", 1L, 333333L)))
  }

  test("cusum closed form equals the textbook recurrence on random series") {
    val rnd = new scala.util.Random(31)
    val series = for {
      k <- Seq("a", "b", "c")
      i <- 1 to 40
    } yield (k, f"d$i%03d", (rnd.nextInt(20) + (if (i > 30) 25 else 0)).toLong)
    val df = series.toDF("key", "ord", "v")
    val got = Cusum.cusumScores(df, col("key"), col("ord"), col("v"),
        tieCol = col("ord"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    for ((k, rows) <- got) {
      val vs = series.filter(_._1 == k).sortBy(_._2).map(_._3)
      val target = vs.sum / vs.length
      var s = 0L
      val want = vs.map { x =>
        s = math.max(0L, s + x - target)
        (s, if (s > 3 * target) 1 else 0)
      }
      assert(rows.map(r => (r._5, r._6)).toSeq == want,
        s"key $k: closed form must equal the recurrence")
      assert(rows.forall(_._4 == target))
    }
    // the injected level shift at i>30 must actually flag somewhere
    assert(got.values.flatten.exists(_._6 == 1), "shift must be detected")
  }

  test("label propagation: majority vote, (cnt desc, label asc) ties, pinned seeds") {
    // seeds: 1→10, 2→20, 3→10; node 100 sees {10, 20, 10} → 10;
    // node 200 sees {10, 20} → tie → min label 10;
    // node 300 sees only unlabeled 400 in round 1 → labeled via 400
    // never (400 has no labeled neighbor) — both stay absent;
    // seed 1 also neighbors 2 (label 20) but stays pinned at 10
    val edges = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L),
      (1L, 200L), (2L, 200L),
      (300L, 400L), (1L, 2L)
    ).toDF("src", "dst")
    val seeds = Seq((1L, 10L), (2L, 20L), (3L, 10L)).toDF("node", "label")
    val got = LabelProp.propagate(edges, seeds, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 10L, 2L -> 20L, 3L -> 10L,
      100L -> 10L, 200L -> 10L))
    // two-hop reach: a chain seed-5-6 labels 6 on round 2
    val chain = Seq((7L, 5L), (5L, 6L)).toDF("src", "dst")
    val g2 = LabelProp.propagate(chain, Seq((7L, 99L)).toDF("node", "label"),
      iters = 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g2 == Map(7L -> 99L, 5L -> 99L, 6L -> 99L))
    // conflicting seed labels resolve to the min, one row per node,
    // and the neighbor receives ONE vote, not two
    val g3 = LabelProp.propagate(Seq((7L, 5L)).toDF("src", "dst"),
        Seq((7L, 99L), (7L, 11L)).toDF("node", "label"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(g3.sortBy(_._1).toSeq == Seq(5L -> 11L, 7L -> 11L))
  }

  test("label propagation: pinned adjacency, zero edge-sized exchanges per round") {
    import graft.ops.PageRank
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    saved.foreach { case (k, _) => conf.set(k, "-1") }
    try {
      val edges = (0L until 2000L).map(i => (i, 10000L + i % 500))
        .toDF("src", "dst")
      val e = edges.select($"src", $"dst").distinct()
      val adj = PageRank.pinBy(e.unionByName(
        e.select($"dst".as("src"), $"src".as("dst"))), "src")
      val seed = (0L until 2000L by 4).map(i => (i, i % 7)).toDF("node", "label")
        .localCheckpoint()
      val l1 = LabelProp.voteRound(adj, seed, seed).localCheckpoint()
      val l2 = LabelProp.voteRound(adj, seed, l1)
      assert(l2.count() > 0)
      def exchanges(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike] = {
        val here = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            exchanges(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            exchanges(q.plan)
          case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
            Seq(x) ++ exchanges(x.child)
          case _ => Nil
        }
        here ++ p.children.flatMap(exchanges)
      }
      val xs = exchanges(l2.queryExecution.executedPlan)
      assert(xs.nonEmpty, "expected label-frame shuffles in the plan")
      // only the adjacency frame carries both src and dst
      val edgeSized = xs.filter { x =>
        val names = x.child.output.map(_.name).toSet
        names.contains("src") && names.contains("dst")
      }
      assert(edgeSized.isEmpty,
        s"adjacency re-shuffled: ${edgeSized.map(_.child.output.map(_.name))}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("recallAtK: hand overlaps, zero-hit queries kept, ppm floors") {
    import graft.vector.Eval
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 20L), (2L, 21L), (2L, 22L), (2L, 23L),
      (3L, 30L), (3L, 31L), (3L, 32L), (3L, 33L))
      .toDF("query_id", "vec_id")
    val approx = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), // 4/4
      (2L, 20L), (2L, 99L), (2L, 98L), (2L, 23L),                // 2/4
      (3L, 90L), (3L, 91L), (3L, 92L), (3L, 93L))                // 0/4
      .toDF("query_id", "vec_id")
    val got = Eval.recallAtK(exact, approx, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 4L, 1000000L), (2L, 2L, 500000L),
      (3L, 0L, 0L)))
  }

  test("topPByGroup: crossing row kept, mass shares exact, group-independent") {
    import graft.ops.Sampler
    // group A masses 50,30,20 (total 100): p=0.7 keeps 50 (starts at
    // 0) and 30 (starts at 0.5) but not 20 (starts at 0.8 = p when
    // pPpm=700000? 0.8 > 0.7 → dropped); group B single row always kept
    val df = Seq((1L, "A", 50L), (2L, "A", 30L), (3L, "A", 20L),
      (4L, "B", 7L)).toDF("doc_id", "source", "n_chars")
    val got = Sampler.topPByGroup(df, col("doc_id"), col("source"),
        col("n_chars"), pPpm = 700000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "A", 50L, 500000L),   // cum 50, share 0.5
      (2L, "A", 80L, 800000L),   // starts at 0.5 < 0.7 → kept (crossing)
      (4L, "B", 7L, 1000000L)))  // whole group
    // exactly-at-p boundary: a row starting AT p is dropped
    val boundary = Sampler.topPByGroup(df, col("doc_id"), col("source"),
        col("n_chars"), pPpm = 800000L)
      .collect().map(_.getLong(0)).toSet
    assert(!boundary.contains(3L), "row starting exactly at p is out")
  }

  test("hardNegatives: same-label neighbors excluded, cosine rank order") {
    import graft.vector.VectorSearch
    // query 100 (label x) points +x; 1 (x) is closest but same label;
    // 2 (y) next; 3 (z) orthogonal; 4 (y) opposite
    val emb = Seq(
      (100L, "x", Seq(1.0f, 0.0f)),
      (1L, "x", Seq(0.99f, 0.01f)),
      (2L, "y", Seq(0.9f, 0.1f)),
      (3L, "z", Seq(0.0f, 1.0f)),
      (4L, "y", Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = VectorSearch.hardNegatives(emb,
        emb.filter($"vec_id" === 100L), k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(2L, 3L, 4L),
      s"same-label 1 must be excluded, order by cosine: $got")
    assert(got.map(_._3).toSeq == Seq("y", "z", "y"))
  }

  test("mad outliers equal a plain-Scala replay across random groups") {
    val rnd = new scala.util.Random(47)
    val rows = (1L to 300L).map { id =>
      val g = s"g${id % 4}"
      val v = if (id % 37 == 0) 5000L + rnd.nextInt(100)
        else 100L + rnd.nextInt(50)
      (id, g, v)
    }
    val df = rows.toDF("doc_id", "source", "n_chars")
    val got = RobustStats.madOutliers(df, col("doc_id"), col("source"),
        col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getInt(6))).sortBy(_._1)
    def lowerMedian(xs: Seq[(Long, Long)]): Long = {
      // element at rank (n+1)/2 in (value, id) order
      val sorted = xs.sortBy { case (v, id) => (v, id) }
      sorted(((sorted.size + 1) / 2) - 1)._1
    }
    val byG = rows.groupBy(_._2)
    val want = rows.map { case (id, g, v) =>
      val grp = byG(g)
      val med = lowerMedian(grp.map(x => (x._3, x._1)))
      val mad = lowerMedian(grp.map(x => (math.abs(x._3 - med), x._1)))
      (id, med, mad, if (math.abs(v - med) > 3 * mad) 1 else 0)
    }.sortBy(_._1)
    assert(got.toSeq == want)
    assert(got.count(_._4 == 1) > 0, "the injected 5000s must flag")
  }

  test("propagateToFixpoint equals fixed-iteration propagate on the vote fixture") {
    // the q138-shaped bipartite fixture: pinned seeds converge after
    // the first vote round, so fixpoint ≡ iters=1 ≡ iters=2
    val edges = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L),
      (1L, 200L), (2L, 200L),
      (300L, 400L), (1L, 2L)
    ).toDF("src", "dst")
    val seeds = Seq((1L, 10L), (2L, 20L), (3L, 10L)).toDF("node", "label")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fix = toMap(LabelProp.propagateToFixpoint(edges, seeds))
    assert(fix == toMap(LabelProp.propagate(edges, seeds, iters = 2)))
    assert(fix == Map(1L -> 10L, 2L -> 20L, 3L -> 10L,
      100L -> 10L, 200L -> 10L))
  }

  test("propagateToFixpoint converges at depth+1 rounds, one job per round") {
    // a depth-d chain labels node d in round d and detects the
    // fixpoint in round d+1; with AQE and broadcast off each round is
    // exactly ONE job (the checksum rides the checkpoint), so the job
    // counts of two chain depths differ by exactly the round delta
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sc = spark.sparkContext
      def jobsFor(depth: Int): (Int, Map[Long, Long]) = {
        val chain = (0 until depth).map(i => (i.toLong, i + 1L))
          .toDF("src", "dst")
        val seeds = Seq((0L, 42L)).toDF("node", "label")
        val group = s"lp-fix-$depth"
        sc.setJobGroup(group, "fixpoint job accounting")
        val out =
          try LabelProp.propagateToFixpoint(chain, seeds, maxIters = depth + 5)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          finally sc.clearJobGroup()
        // the status store fills asynchronously: poll until stable
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
      val (j6, out6) = jobsFor(6)
      val (j10, out10) = jobsFor(10)
      // every chain node ends up labeled 42
      assert(out6 == (0 to 6).map(_.toLong -> 42L).toMap)
      assert(out10 == (0 to 10).map(_.toLong -> 42L).toMap)
      // 4 extra chain links = 4 extra vote rounds = exactly 4 jobs
      assert(j10 - j6 == 4,
        s"one job per round: depth 6 → $j6 jobs, depth 10 → $j10 jobs")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("propagateToFixpoint maxIters backstop raises before convergence") {
    val chain = (0 until 10).map(i => (i.toLong, i + 1L)).toDF("src", "dst")
    val seeds = Seq((0L, 42L)).toDF("node", "label")
    val e = intercept[IllegalArgumentException] {
      LabelProp.propagateToFixpoint(chain, seeds, maxIters = 3)
    }
    assert(e.getMessage.contains("no fixpoint within 3 rounds"))
  }
}
