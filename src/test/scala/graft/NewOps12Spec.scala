package graft

import graft.vector.Eval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-12 additions: nDCG@k and MAP@k over
  * labeled rankings (the graded/strict ranking grades beside
  * recall@k and RBO), ROUGE-L generation eval, and the streaming
  * agreement face's building blocks.
  */
class NewOps12Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- Eval.ndcgAtK ---------------------------------------------------

  test("ndcgWeights match the hand constants baked into the oracle SQL") {
    val (w, cum) = Eval.ndcgWeights(10)
    assert(w == Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
      356207L, 333333L, 315465L, 301030L, 289065L))
    assert(cum == Seq(1000000L, 1630930L, 2130930L, 2561607L, 2948460L,
      3304667L, 3638000L, 3953465L, 4254495L, 4543560L))
  }

  test("ndcgAtK reproduces a hand-computed ranking") {
    // q1: rel at ranks 1 and 3 of k=3, n_rel=5 ->
    //   dcg = W(1)+W(3) = 1500000, ideal = cumW(3) = 2130930
    // q2: nothing relevant retrieved, n_rel=0 -> ndcg 0, ideal 0
    // q3: absent from the ranked frame entirely, n_rel=2 ->
    //   dcg 0, ideal = cumW(2)
    val ranked = Seq(
      (1L, 1, 1L), (1L, 2, 0L), (1L, 3, 1L),
      (2L, 1, 0L), (2L, 2, 0L), (2L, 3, 0L))
      .toDF("query_id", "rnk", "rel")
    val nRel = Seq((1L, 5L), (2L, 0L), (3L, 2L)).toDF("query_id", "n_rel")
    val out = Eval.ndcgAtK(ranked, nRel, k = 3).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val q1 = out(0)
    assert(q1.getLong(2) == 1500000L && q1.getLong(3) == 2130930L)
    assert(q1.getDouble(4) == 1500000.0 / 2130930.0)
    assert(out(1).getLong(3) == 0L && out(1).getDouble(4) == 0.0)
    assert(out(2).getLong(2) == 0L && out(2).getLong(3) == 1630930L &&
      out(2).getDouble(4) == 0.0)
  }

  test("ndcgAtK: perfect head-first ranking scores 1.0 when n_rel <= k") {
    val ranked = Seq((1L, 1, 1L), (1L, 2, 1L), (1L, 3, 0L))
      .toDF("query_id", "rnk", "rel")
    val nRel = Seq((1L, 2L)).toDF("query_id", "n_rel")
    val out = Eval.ndcgAtK(ranked, nRel, k = 3).collect()
    assert(out.head.getDouble(4) == 1.0)
  }

  test("ndcgAtK prefers the head-loaded ranking over the tail-loaded one") {
    val head = Seq((1L, 1, 1L), (1L, 2, 0L), (1L, 3, 0L))
      .toDF("query_id", "rnk", "rel")
    val tail = Seq((1L, 1, 0L), (1L, 2, 0L), (1L, 3, 1L))
      .toDF("query_id", "rnk", "rel")
    val nRel = Seq((1L, 1L)).toDF("query_id", "n_rel")
    val h = Eval.ndcgAtK(head, nRel, 3).collect().head.getDouble(4)
    val t = Eval.ndcgAtK(tail, nRel, 3).collect().head.getDouble(4)
    assert(h == 1.0 && t < h, s"head $h must beat tail $t")
  }

  // --- Eval.mapAtK ----------------------------------------------------

  test("mapAtK reproduces a hand-computed AP") {
    // rel at ranks 1 and 3 of k=3: AP = (P@1 + P@3)/min(5,3)
    //   = (1 + 2/3)/3 = 5/9; mass over L=6: 1*6 + 2*2 = 10, denom 18
    val ranked = Seq((1L, 1, 1L), (1L, 2, 0L), (1L, 3, 1L))
      .toDF("query_id", "rnk", "rel")
    val nRel = Seq((1L, 5L)).toDF("query_id", "n_rel")
    val out = Eval.mapAtK(ranked, nRel, k = 3).collect().head
    assert(out.getLong(2) == 10L)
    assert(out.getDouble(3) == 10.0 / 18.0)
  }

  test("mapAtK: early miss drags later hits; zero relevant mass is 0.0") {
    // all-relevant-first is 1.0 when n_rel <= k
    val perfect = Seq((1L, 1, 1L), (1L, 2, 1L), (1L, 3, 0L))
      .toDF("query_id", "rnk", "rel")
    val nRel = Seq((1L, 2L)).toDF("query_id", "n_rel")
    assert(Eval.mapAtK(perfect, nRel, 3).collect().head.getDouble(3) == 1.0)
    // same two hits pushed one rank down: AP = (1/2 + 2/3)/2 = 7/12
    val shifted = Seq((1L, 1, 0L), (1L, 2, 1L), (1L, 3, 1L))
      .toDF("query_id", "rnk", "rel")
    val s = Eval.mapAtK(shifted, nRel, 3).collect().head
    assert(s.getDouble(3) == 7.0 / 12.0)
    // no relevant mass at all
    val none = Seq((2L, 1, 0L)).toDF("query_id", "rnk", "rel")
    val zero = Seq((2L, 0L)).toDF("query_id", "n_rel")
    assert(Eval.mapAtK(none, zero, 3).collect().head.getDouble(3) == 0.0)
  }

  test("ndcgAtK/mapAtK refuse out-of-range k") {
    val r = Seq((1L, 1, 1L)).toDF("query_id", "rnk", "rel")
    val n = Seq((1L, 1L)).toDF("query_id", "n_rel")
    intercept[IllegalArgumentException](Eval.ndcgAtK(r, n, 0))
    intercept[IllegalArgumentException](Eval.mapAtK(r, n, 21))
  }

  // --- Agreement.krippendorffAlpha --------------------------------------

  test("krippendorffAlpha reproduces a hand-computed incomplete panel") {
    // items: 1:[a,a] 2:[a,b] 3:[b,b,b] 4:[a,a,b] — n_u in {2,3}
    // per-item (n_u^2 - Σ n_uc^2)/(n_u-1): 0, 2, 0, 2 -> D_o = 4/10
    // n = 10, n_a = n_b = 5 -> D_e = (100-50)/90 = 5/9
    // alpha = 1 - (9*4)/(100-50) = 1 - 36/50 = 0.28
    val ratings = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"), (4L, "a"), (4L, "a"), (4L, "b"))
      .toDF("item", "cls")
    val out = graft.ops.Agreement
      .krippendorffAlpha(ratings, col("item"), col("cls")).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(out.map(_.getLong(1)).toSeq == Seq(5L, 5L))
    assert(out.forall(_.getDouble(2) == 0.5))
    assert(out.forall(r => r.getDouble(3) == 1.0 - 36.0 / 50.0),
      s"alpha must be 0.28, got ${out.head.getDouble(3)}")
  }

  test("krippendorffAlpha: perfect agreement is 1, single-category " +
    "census is 0.0 (not NaN), single-rated items are dropped") {
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"), (2L, "b"))
      .toDF("item", "cls")
    val p = graft.ops.Agreement
      .krippendorffAlpha(perfect, col("item"), col("cls")).collect()
    assert(p.forall(_.getDouble(3) == 1.0))
    val constant = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
      .toDF("item", "cls")
    val c = graft.ops.Agreement
      .krippendorffAlpha(constant, col("item"), col("cls")).collect()
    assert(c.length == 1 && c.head.getDouble(3) == 0.0)
    // a single-rated item must not perturb alpha OR the marginals
    val withSingle = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"), (4L, "a"), (4L, "a"), (4L, "b"),
      (9L, "zzz"))
      .toDF("item", "cls")
    val s = graft.ops.Agreement
      .krippendorffAlpha(withSingle, col("item"), col("cls")).collect()
    assert(s.map(_.getString(0)).toSeq == Seq("a", "b"),
      "the single-rated item's category must not appear in marginals")
    assert(s.forall(r => r.getDouble(3) == 1.0 - 36.0 / 50.0))
  }

  test("krippendorffAlpha accepts the panel fleissKappa refuses, and " +
    "refuses >21-rater items loudly") {
    val uneven = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"), (2L, "a"))
      .toDF("item", "cls")
    intercept[IllegalArgumentException] {
      graft.ops.Agreement.fleissKappa(uneven, col("item"), col("cls"))
    }
    // same panel is well-defined for alpha
    val a = graft.ops.Agreement
      .krippendorffAlpha(uneven, col("item"), col("cls")).collect()
    assert(a.nonEmpty && !a.head.getDouble(3).isNaN)
    // 22 ratings on one item would truncate lcm(1..20)/(n_u-1)
    val wide = (1 to 22).map(i => (1L, if (i % 2 == 0) "a" else "b"))
      .toDF("item", "cls")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Agreement.krippendorffAlpha(wide, col("item"), col("cls"))
    }
    assert(e.getMessage.contains("21"), e.getMessage)
    // no multi-rated item at all
    val singles = Seq((1L, "a"), (2L, "b")).toDF("item", "cls")
    intercept[IllegalArgumentException] {
      graft.ops.Agreement.krippendorffAlpha(singles, col("item"), col("cls"))
    }
  }

  // --- LcsLength / GenerationEval.rougeL --------------------------------

  test("LcsLength matches hand-computed subsequences (codegen and interpreted)") {
    val df = Seq(
      (1L, "a b c b d a b", "b d c a b a"), // LCS = 4 (b c a b)
      (2L, "x y z", "q r s"),               // disjoint -> 0
      (3L, "hello world", "hello world"),   // identical -> 2
      (4L, "", "a b"),                      // split("") = [""] -> 0
      (5L, "a a a", "a a"))                 // multiplicity -> 2
      .toDF("id", "ca", "re")
      .select(col("id"), split(col("ca"), " ").as("a"),
        split(col("re"), " ").as("b"))
    val got = df.select(col("id"),
        graft.functions.Lcs.lcsLength(col("a"), col("b")).as("l"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.toSeq == Seq(1L -> 4L, 2L -> 0L, 3L -> 2L, 4L -> 0L, 5L -> 2L))
    // interpreted path (constant folding evaluates without codegen)
    val folded = spark.range(1).select(graft.functions.Lcs.lcsLength(
        array(lit("a"), lit("b"), lit("c")),
        array(lit("b"), lit("c"), lit("a"))).as("l"))
      .collect().head.getLong(0)
    assert(folded == 2L)
  }

  test("LcsLength: null elements match nothing, null arrays propagate null") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(StringType, containsNull = true)),
      StructField("b", ArrayType(StringType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(Seq("x", null, "y"), Seq(null, "x", "y")),
      org.apache.spark.sql.Row(null, Seq("x")))
    val df = spark.createDataFrame(rows, schema)
    val got = df.select(
      graft.functions.Lcs.lcsLength(col("a"), col("b")).as("l")).collect()
    assert(got(0).getLong(0) == 2L, "null tokens must not match each other")
    assert(got(1).isNullAt(0), "null array propagates null")
  }

  test("rougeL reproduces hand-computed precision/recall/F1 and is " +
    "order-sensitive where BLEU-1 is not") {
    val pairs = Seq(
      (1L, "a b c b d a b", "b d c a b a"),
      (2L, "the cat sat", "sat cat the"), // bag-identical, order broken
      (3L, "same text here", "same text here"))
      .toDF("pair_id", "cand", "ref")
    val out = graft.text.GenerationEval
      .rougeL(pairs, "pair_id", "cand", "ref").collect()
    val p1 = out(0)
    assert(p1.getLong(3) == 4L && p1.getDouble(4) == 4.0 / 7.0 &&
      p1.getDouble(5) == 4.0 / 6.0 && p1.getDouble(6) == 8.0 / 13.0)
    // pair 2: unigram-clipped BLEU would be 1.0; LCS of a reversed
    // 3-token sentence is 1 -> f1 = 2/6
    assert(out(1).getLong(3) == 1L && out(1).getDouble(6) == 2.0 / 6.0)
    // identical texts: perfect 1.0 on all three
    assert(out(2).getDouble(4) == 1.0 && out(2).getDouble(5) == 1.0 &&
      out(2).getDouble(6) == 1.0)
  }

  test("rougeL maxTokens bounds both sides of the DP") {
    val pairs = Seq((1L, "a b c d e", "a b x y z")).toDF("pair_id", "c", "r")
    val out = graft.text.GenerationEval
      .rougeL(pairs, "pair_id", "c", "r", maxTokens = 2).collect().head
    assert(out.getLong(1) == 2L && out.getLong(2) == 2L &&
      out.getLong(3) == 2L && out.getDouble(6) == 1.0)
  }

  // --- GenerationEval.chrF ----------------------------------------------

  test("chrF reproduces hand-computed character n-gram counts and F2") {
    // cand "ab cd" -> "abcd", ref "abcd": identical after space
    // removal -> every order's P=R=F=1 while grams exist; orders 5,6
    // have no grams on a 4-char string -> F=0; chrf = 4/6
    val pairs = Seq((1L, "ab cd", "abcd")).toDF("pair_id", "cand", "ref")
    val out = graft.text.GenerationEval
      .chrF(pairs, "pair_id", "cand", "ref").collect().head
    // order 1: 4 grams each, clip 4; order 4: 1 gram, clip 1
    assert(out.getLong(out.fieldIndex("total_c1")) == 4L &&
      out.getLong(out.fieldIndex("clip1")) == 4L)
    assert(out.getLong(out.fieldIndex("total_c4")) == 1L &&
      out.getLong(out.fieldIndex("clip4")) == 1L)
    assert(out.getLong(out.fieldIndex("total_c5")) == 0L &&
      out.getLong(out.fieldIndex("clip5")) == 0L)
    assert(out.getDouble(out.fieldIndex("chrf")) == 4.0 / 6.0)
  }

  test("chrF: multiplicity clips, disjoint texts score 0, and beta=2 " +
    "weighs recall over precision") {
    // cand "aaa" vs ref "aa": unigram nc=3, nr=2 -> clip 2
    val pairs = Seq((1L, "aaa", "aa"), (2L, "xyz", "abc"))
      .toDF("pair_id", "cand", "ref")
    val out = graft.text.GenerationEval
      .chrF(pairs, "pair_id", "cand", "ref", maxOrder = 2).collect()
    val p1 = out(0)
    assert(p1.getLong(p1.fieldIndex("total_c1")) == 3L &&
      p1.getLong(p1.fieldIndex("total_r1")) == 2L &&
      p1.getLong(p1.fieldIndex("clip1")) == 2L)
    // order1: P=2/3, R=1 -> F2 = 5PR/(4P+R); order2: "aa","aa","aa"x?
    // cand grams aa,aa nc=2; ref gram aa nr=1 -> clip 1, P=1/2, R=1
    val pA = 2.0 / 3.0
    val f1 = 5.0 * pA * 1.0 / (4.0 * pA + 1.0)
    val pB = 1.0 / 2.0
    val f2 = 5.0 * pB * 1.0 / (4.0 * pB + 1.0)
    assert(p1.getDouble(p1.fieldIndex("chrf")) == (f1 + f2) / 2.0)
    assert(out(1).getDouble(out(1).fieldIndex("chrf")) == 0.0)
    // recall weighting: truncation (hurts recall) scores worse than
    // padding (hurts precision) against the same reference
    val asym = Seq((1L, "abcdefgh", "abcd"), (2L, "abcd", "abcdefgh"))
      .toDF("pair_id", "cand", "ref")
    val a = graft.text.GenerationEval
      .chrF(asym, "pair_id", "cand", "ref").collect()
    assert(a(0).getDouble(a(0).fieldIndex("chrf")) >
      a(1).getDouble(a(1).fieldIndex("chrf")),
      "beta=2 must punish missing reference mass more than extra mass")
  }

  test("rougeL plan: zero shuffle beyond the sink sort, LCS inside " +
    "whole-stage codegen") {
    // range-backed so the projection cannot constant-fold to a
    // LocalTableScan (a Seq fixture folds the whole DP on the driver)
    val pairs = spark.range(8).select(col("id").as("pair_id"),
      concat_ws(" ", lit("a"), col("id").cast("string"), lit("b"))
        .as("cand"),
      lit("a x b").as("ref"))
    val df = graft.text.GenerationEval
      .rougeL(pairs, "pair_id", "cand", "ref")
    df.collect() // finalize AQE so codegen spans are visible
    val plan = df.queryExecution.executedPlan
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val here = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          shuffles(a.executedPlan)
        case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          1 + shuffles(x.child)
        case _ => 0
      }
      here + p.children.map(shuffles).sum
    }
    // the operator is a per-row projection: the ONLY exchange allowed
    // is the final orderBy's range partitioning
    assert(shuffles(plan) <= 1, s"rougeL must not shuffle the pairs:\n$plan")
    // the DP expression must not knock the projection out of codegen:
    // the lcslength Project must carry the whole-stage marker `*(n)`
    assert(plan.toString.linesIterator.exists(l =>
        l.contains("lcslength") && l.trim.matches("""^[+\-:\s]*\*\(\d+\) Project .*""")),
      s"LCS projection fell out of whole-stage codegen:\n$plan")
  }
}
