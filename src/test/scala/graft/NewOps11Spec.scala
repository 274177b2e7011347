package graft

import graft.ops.Agreement
import graft.text.GenerationEval
import graft.vector.Eval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-11 additions: Fleiss' kappa
  * (multi-rater agreement), truncated rank-biased overlap at p = 1/2
  * (top-weighted ANN list comparison), and BLEU-2 clipped n-gram
  * precision (reference-based text overlap).
  */
class NewOps11Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- Agreement.fleissKappa -----------------------------------------

  test("fleissKappa reproduces a hand-computed 2-rater panel") {
    // items: 1:[a,a] 2:[a,b] 3:[b,b] 4:[a,a] -> N=4, n=2
    // p_bar = (14 - 8)/8 = 0.75; c_a=5, c_b=3 -> p_e = 34/64
    // kappa = (0.75 - 0.53125)/0.46875 = 7/15
    val ratings = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (4L, "a"), (4L, "a"))
      .toDF("item", "cls")
    val out = Agreement.fleissKappa(ratings, col("item"), col("cls"))
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    val a = out(0); val b = out(1)
    assert(a.getLong(1) == 5 && b.getLong(1) == 3)
    assert(a.getDouble(2) == 5.0 / 8.0 && b.getDouble(2) == 3.0 / 8.0)
    assert(out.forall(_.getDouble(3) == 0.75), "p_bar")
    assert(out.forall(r => math.abs(r.getDouble(4) - 7.0 / 15.0) < 1e-15),
      "kappa = 7/15")
  }

  test("fleissKappa: perfect agreement is 1, constant panel is 0, not NaN") {
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("item", "cls")
    val p = Agreement.fleissKappa(perfect, col("item"), col("cls")).collect()
    assert(p.forall(_.getDouble(4) == 1.0))
    // every rating one category: p_e = 1 -> chance-corrected
    // denominator 0; report 0.0 (p_bar still 1.0)
    val constant = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
      .toDF("item", "cls")
    val c = Agreement.fleissKappa(constant, col("item"), col("cls")).collect()
    assert(c.length == 1 && c.head.getDouble(3) == 1.0 &&
      c.head.getDouble(4) == 0.0)
  }

  test("fleissKappa refuses heterogeneous rating counts and single raters") {
    val uneven = Seq((1L, "a"), (1L, "a"), (2L, "a"))
      .toDF("item", "cls")
    val e1 = intercept[IllegalArgumentException] {
      Agreement.fleissKappa(uneven, col("item"), col("cls"))
    }
    assert(e1.getMessage.contains("CONSTANT rating count"), e1.getMessage)
    val single = Seq((1L, "a"), (2L, "b")).toDF("item", "cls")
    val e2 = intercept[IllegalArgumentException] {
      Agreement.fleissKappa(single, col("item"), col("cls"))
    }
    assert(e2.getMessage.contains("at least 2 ratings"), e2.getMessage)
  }

  test("fleissKappa punishes chance-level agreement on an imbalanced panel") {
    // two raters flipping independently between en/und on half the
    // items each in opposite phase: observed agreement equals chance
    val ratings = (1L to 100L).flatMap { i =>
      Seq((i, if (i % 2 == 0) "en" else "und"),
        (i, if ((i / 2) % 2 == 0) "en" else "und"))
    }.toDF("item", "cls")
    val out = Agreement.fleissKappa(ratings, col("item"), col("cls"))
      .collect()
    assert(out.forall(r => math.abs(r.getDouble(4)) < 0.05),
      s"independent raters must score near 0: ${out.map(_.getDouble(4)).toSeq}")
  }

  // --- Eval.rboHalf ----------------------------------------------------

  test("rboHalf weight table at k=10 matches the oracle constants") {
    val (d, w) = Eval.rboWeights(10)
    assert(d == 2580480L)
    assert(w == Seq(1788440L, 498200L, 175640L, 68120L, 27800L, 11672L,
      4952L, 2072L, 812L, 252L))
    // identical lists: mass = sum of W(d) = D * (1 - 2^-10)
    assert(w.sum == 2577960L && w.sum * 1024L == d * 1023L)
  }

  private def ranked(rows: Seq[(Long, Int, Long)]) =
    rows.toDF("query_id", "rnk", "vec_id")

  test("rboHalf: identical lists score 1 - 2^-k; disjoint score 0") {
    val a = ranked((1 to 10).map(r => (1L, r, r.toLong)))
    val same = Eval.rboHalf(a, a, k = 10).collect()
    assert(same.head.getLong(1) == 2577960L)
    assert(same.head.getDouble(2) == 2577960.0 / 2580480.0)
    val b = ranked((1 to 10).map(r => (1L, r, 100L + r)))
    val none = Eval.rboHalf(a, b, k = 10).collect()
    assert(none.length == 1 && none.head.getLong(1) == 0L &&
      none.head.getDouble(2) == 0.0,
      "zero-overlap queries stay in the report with 0.0")
  }

  test("rboHalf hand example at k=2 and top-weighting direction") {
    // A=[x,y], B=[y,x]: both match at m=2 -> mass = 2*W(2) = 2,
    // D = lcm(1,2)*4 = 8 -> rbo = 0.25 (= ov_2/(2*2^2))
    val aXY = ranked(Seq((1L, 1, 10L), (1L, 2, 20L)))
    val bYX = ranked(Seq((1L, 1, 20L), (1L, 2, 10L)))
    val swap = Eval.rboHalf(aXY, bYX, k = 2).collect()
    assert(swap.head.getLong(1) == 2L && swap.head.getDouble(2) == 0.25)
    // head match (m=1, W=5) must outscore tail match (m=2, W=1)
    val bXZ = ranked(Seq((1L, 1, 10L), (1L, 2, 30L)))
    val bZY = ranked(Seq((1L, 1, 30L), (1L, 2, 20L)))
    val head = Eval.rboHalf(aXY, bXZ, k = 2).collect().head.getDouble(2)
    val tail = Eval.rboHalf(aXY, bZY, k = 2).collect().head.getDouble(2)
    assert(head == 0.625 && tail == 0.125 && head > tail,
      "RBO must top-weight: a head match beats a tail match")
  }

  test("rboHalf at sf0.001 is consistent with recallAtK and bounded") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val qs = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
    val exact = graft.vector.VectorSearch.bruteForceTopK(emb, qs, k = 10)
    val approx = graft.vector.VectorSearch.int8TopK(emb, qs, k = 10)
    val rbo = Eval.rboHalf(exact, approx, k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val rec = Eval.recallAtK(exact, approx, k = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rbo.nonEmpty && rbo.keySet == rec.keySet)
    rbo.foreach { case (q, v) =>
      assert(v >= 0.0 && v <= 2577960.0 / 2580480.0)
      // full recall is necessary (not sufficient) for full RBO mass
      if (v == 2577960.0 / 2580480.0) assert(rec(q) == 10L)
      if (rec(q) == 0L) assert(v == 0.0)
    }
  }

  // --- GenerationEval --------------------------------------------------

  test("bleu2 reproduces hand-clipped counts") {
    // cand 'the cat the cat' vs ref 'the cat sat':
    // unigrams: total 4, clipped min(2,1)+min(2,1)=2 -> p1=0.5
    // bigrams: 'the cat'x2 'cat the'x1 -> total 3, clipped 1 -> p2=1/3
    val pairs = Seq((1L, "the cat the cat", "the cat sat"))
      .toDF("pair_id", "cand", "ref")
    val r = GenerationEval.bleu2(pairs, "pair_id", "cand", "ref")
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 2L, 3L, 1L)))
    assert(r.getDouble(5) == 0.5 && r.getDouble(6) == 1.0 / 3.0)
    assert(r.getDouble(7) == math.sqrt(0.5 * (1.0 / 3.0)))
  }

  test("bleu2: identical texts score 1, disjoint texts 0") {
    val pairs = Seq(
      (1L, "w1 w2 w3", "w1 w2 w3"),
      (2L, "a b c", "x y z")).toDF("pair_id", "cand", "ref")
    val out = GenerationEval.bleu2(pairs, "pair_id", "cand", "ref")
      .collect()
    assert(out(0).getDouble(7) == 1.0)
    assert(out(1).getDouble(7) == 0.0)
  }

  test("bleu2 keeps gram-less pairs with zeros, never NULL/NaN") {
    // one-token candidate: no bigrams; clipped counts reattach as 0
    val pairs = Seq((1L, "hello", "hello world"))
      .toDF("pair_id", "cand", "ref")
    val r = GenerationEval.bleu2(pairs, "pair_id", "cand", "ref")
      .collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L)
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(r.getDouble(5) == 1.0 && r.getDouble(6) == 0.0 &&
      r.getDouble(7) == 0.0)
  }

  test("bleu2 scans the pairs exactly once (no per-order re-read)") {
    // the q158 pairing join reads documents twice (cand side + ref
    // side); the metric itself must add ZERO further corpus passes —
    // the naive per-side-per-order composition would make it ten
    val plan = graft.queries.PipelineQueries
      .generationBleu(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val scans = "ReadSchema: struct<".r.findAllMatchIn(plan).size
    assert(scans == 2,
      s"expected exactly the 2 pairing-join scans, saw $scans:\n$plan")
  }

  test("clipped counts use multiplicity, not the set view") {
    // set-Jaccard would call these identical; clipping must not
    val pairs = Seq((1L, "w w w w", "w")).toDF("pair_id", "cand", "ref")
    val r = GenerationEval.clippedCounts(pairs, "pair_id", "cand", "ref", 1)
      .collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 1L,
      "4 candidate occurrences, clipped to the single reference one")
  }
}
