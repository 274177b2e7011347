package graft

import graft.ops.ScoreEval
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-12 extension batch: threshold-free
  * score evaluation (ROC-AUC, the ROC operating-point table,
  * calibration/ECE), tie-corrected Spearman rank correlation, and
  * distinct-n corpus diversity.
  */
class NewOps13Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- ScoreEval.rocAuc -----------------------------------------------

  test("rocAuc reproduces the hand-computed Mann–Whitney value with ties") {
    // pos scores {3,2}, neg scores {1,2}: pairs (3,1)> (3,2)> (2,1)>
    // (2,2)= -> U = 3.5 of 4, AUC = 0.875
    val df = Seq((3L, 1L), (2L, 1L), (1L, 0L), (2L, 0L)).toDF("s", "y")
    val r = ScoreEval.rocAuc(df, col("s"), col("y")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.875)
  }

  test("rocAuc: perfect separation is 1.0, reversed is 0.0, single class 0.0") {
    val perfect = Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L)).toDF("s", "y")
    assert(ScoreEval.rocAuc(perfect, col("s"), col("y"))
      .collect().head.getDouble(2) == 1.0)
    val reversed = Seq((1L, 1L), (2L, 0L)).toDF("s", "y")
    assert(ScoreEval.rocAuc(reversed, col("s"), col("y"))
      .collect().head.getDouble(2) == 0.0)
    val onlyPos = Seq((1L, 1L), (2L, 1L)).toDF("s", "y")
    val r = ScoreEval.rocAuc(onlyPos, col("s"), col("y")).collect().head
    assert(r.getLong(1) == 0L && r.getDouble(2) == 0.0)
  }

  test("rocAuc refuses a non-binary label loudly") {
    val df = Seq((1L, 2L)).toDF("s", "y")
    val e = intercept[Exception] {
      ScoreEval.rocAuc(df, col("s"), col("y")).collect()
    }
    assert(e.getMessage.contains("must be 0 or 1"),
      s"expected the 0/1 guard, got: ${e.getMessage}")
  }

  // --- ScoreEval.rocCurve ---------------------------------------------

  test("rocCurve reproduces the hand-computed operating-point table") {
    val df = Seq((3L, 1L), (2L, 1L), (1L, 0L), (2L, 0L)).toDF("s", "y")
    val rows = ScoreEval.rocCurve(df, col("s"), col("y")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // thr=1: everything predicted positive
    val t1 = rows(0)
    assert(t1.getLong(1) == 2L && t1.getLong(2) == 2L &&
      t1.getLong(3) == 0L && t1.getLong(4) == 0L)
    assert(t1.getDouble(5) == 1.0 && t1.getDouble(6) == 1.0 &&
      t1.getDouble(7) == 0.5)
    // thr=2: loses the s=1 negative
    val t2 = rows(1)
    assert(t2.getLong(1) == 2L && t2.getLong(2) == 1L)
    assert(t2.getDouble(5) == 1.0 && t2.getDouble(6) == 0.5 &&
      t2.getDouble(7) == 2.0 / 3.0)
    // thr=3: only the top positive stays
    val t3 = rows(2)
    assert(t3.getLong(1) == 1L && t3.getLong(2) == 0L &&
      t3.getLong(3) == 1L && t3.getLong(4) == 2L)
    assert(t3.getDouble(5) == 0.5 && t3.getDouble(6) == 0.0 &&
      t3.getDouble(7) == 1.0)
  }

  test("rocCurve trapezoid area equals rocAuc (the sweep IS the curve)") {
    val df = Seq((5L, 1L), (4L, 0L), (4L, 1L), (3L, 1L), (2L, 0L),
      (1L, 0L), (1L, 1L)).toDF("s", "y")
    val curve = ScoreEval.rocCurve(df, col("s"), col("y"))
      .orderBy(desc("thr")).collect()
    // walk thresholds from strictest down, trapezoid between points,
    // starting at (0,0) and ending at (1,1)
    var (pf, pt, area) = (0.0, 0.0, 0.0)
    for (r <- curve) {
      val (f, t) = (r.getDouble(6), r.getDouble(5))
      area += (f - pf) * (t + pt) / 2.0
      pf = f; pt = t
    }
    area += (1.0 - pf) * (1.0 + pt) / 2.0
    val auc = ScoreEval.rocAuc(df, col("s"), col("y"))
      .collect().head.getDouble(2)
    assert(math.abs(area - auc) < 1e-12, s"trapezoid $area vs rank $auc")
  }

  // --- ScoreEval.averagePrecision ---------------------------------------

  test("averagePrecision reproduces the hand-computed step AP with ties") {
    // thresholds desc: s=3 -> prec 1/1 (micro 1000000), 1 positive;
    // s=2 -> prec 2/3 (micro 666667), 1 positive; s=1 -> no positive.
    // mass = 1666667, ap = 1666667 / 2e6
    val df = Seq((3L, 1L), (2L, 1L), (1L, 0L), (2L, 0L)).toDF("s", "y")
    val r = ScoreEval.averagePrecision(df, col("s"), col("y"))
      .collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1666667.0 / 2000000.0)
  }

  test("averagePrecision: perfect separation 1.0; no positives 0.0; " +
      "imbalance sensitivity vs ROC-AUC") {
    val perfect = Seq((10L, 1L), (9L, 1L), (2L, 0L)).toDF("s", "y")
    assert(ScoreEval.averagePrecision(perfect, col("s"), col("y"))
      .collect().head.getDouble(2) == 1.0)
    val nopos = Seq((1L, 0L), (2L, 0L)).toDF("s", "y")
    assert(ScoreEval.averagePrecision(nopos, col("s"), col("y"))
      .collect().head.getDouble(2) == 0.0)
    // same ranking mistakes, 10x the negatives: ROC-AUC unchanged,
    // AP must drop — the imbalance property AP exists for
    val fewNeg = Seq((3L, 1L), (2L, 0L), (1L, 1L)).toDF("s", "y")
    val manyNeg = (Seq((3L, 1L), (1L, 1L)) ++
      (1 to 10).map(_ => (2L, 0L))).toDF("s", "y")
    val apFew = ScoreEval.averagePrecision(fewNeg, col("s"), col("y"))
      .collect().head.getDouble(2)
    val apMany = ScoreEval.averagePrecision(manyNeg, col("s"), col("y"))
      .collect().head.getDouble(2)
    assert(apMany < apFew, s"AP must degrade with imbalance: $apMany vs $apFew")
    val aucFew = ScoreEval.rocAuc(fewNeg, col("s"), col("y"))
      .collect().head.getDouble(2)
    val aucMany = ScoreEval.rocAuc(manyNeg, col("s"), col("y"))
      .collect().head.getDouble(2)
    assert(aucFew == aucMany, "ROC-AUC is imbalance-blind by construction")
  }

  // --- ScoreEval.brier --------------------------------------------------

  test("brier reproduces hand values and bounds") {
    val sure = Seq((1000L, 1L), (0L, 0L)).toDF("conf", "ok")
    assert(ScoreEval.brier(sure, col("conf"), col("ok"))
      .collect().head.getDouble(1) == 0.0)
    val wrong = Seq((1000L, 0L), (0L, 1L)).toDF("conf", "ok")
    assert(ScoreEval.brier(wrong, col("conf"), col("ok"))
      .collect().head.getDouble(1) == 1.0)
    // gaps -300, 300, -500 -> (9e4+9e4+25e4)/3e6
    val mixed = Seq((700L, 1L), (300L, 0L), (500L, 1L)).toDF("conf", "ok")
    val r = ScoreEval.brier(mixed, col("conf"), col("ok")).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 430000.0 / 3000000.0)
  }

  test("brier guards: out-of-range confidence and non-binary outcome raise") {
    val badConf = Seq((1001L, 1L)).toDF("conf", "ok")
    val e1 = intercept[Exception] {
      ScoreEval.brier(badConf, col("conf"), col("ok")).collect()
    }
    assert(e1.getMessage.contains("[0,1000]"))
    val badOk = Seq((500L, 5L)).toDF("conf", "ok")
    val e2 = intercept[Exception] {
      ScoreEval.brier(badOk, col("conf"), col("ok")).collect()
    }
    assert(e2.getMessage.contains("must be 0 or 1"))
  }

  // --- ScoreEval.calibration ------------------------------------------

  test("calibration reproduces a hand-computed reliability diagram") {
    val df = Seq((400L, 0L), (400L, 1L), (900L, 1L), (1000L, 1L))
      .toDF("conf", "ok")
    val rows = ScoreEval.calibration(df, col("conf"), col("ok"), bins = 2)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val b0 = rows(0)
    assert(b0.getLong(1) == 2L && b0.getLong(2) == 1L &&
      b0.getLong(3) == 800L)
    assert(b0.getDouble(4) == 0.5 && b0.getDouble(5) == 0.4)
    val b1 = rows(1)
    assert(b1.getLong(1) == 2L && b1.getLong(2) == 2L &&
      b1.getLong(3) == 1900L)
    assert(b1.getDouble(4) == 1.0 && b1.getDouble(5) == 0.95)
    // ECE = (|1000-800| + |2000-1900|) / 4000
    assert(b0.getDouble(6) == 300.0 / 4000.0)
    assert(b1.getDouble(6) == b0.getDouble(6))
  }

  test("calibration: perfectly calibrated input has ECE 0; guards fire") {
    val df = Seq((500L, 1L), (500L, 0L)).toDF("conf", "ok")
    val r = ScoreEval.calibration(df, col("conf"), col("ok"), bins = 4)
      .collect().head
    assert(r.getDouble(6) == 0.0)
    val bad = Seq((1001L, 1L)).toDF("conf", "ok")
    val e = intercept[Exception] {
      ScoreEval.calibration(bad, col("conf"), col("ok")).collect()
    }
    assert(e.getMessage.contains("[0,1000]"))
    assertThrows[IllegalArgumentException] {
      ScoreEval.calibration(df, col("conf"), col("ok"), bins = 0)
    }
  }

  // --- ScoreEval.spearman ---------------------------------------------

  /** The operator's documented fixed IEEE sequence — sqrt(S4)² is
    * NOT exactly S4, so the pin is on the exact op order the oracle
    * mirrors, with a tolerance check on the mathematical value.
    */
  private def rhoIeee(s4x: Long, s4y: Long, d2: Long): Double =
    (s4x + s4y - d2).toDouble /
      (2.0 * math.sqrt(s4x.toDouble) * math.sqrt(s4y.toDouble))

  test("spearman: monotone is 1.0, reversed is -1.0, constant is 0.0") {
    // no ties, n=3: S4 = (27-3)/3 = 8 each side; monotone d2 = 0,
    // reversed d2 = 32
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    val ru = ScoreEval.spearman(up, col("x"), col("y"))
      .collect().head.getDouble(1)
    assert(ru == rhoIeee(8, 8, 0) && math.abs(ru - 1.0) < 1e-12)
    val down = Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("x", "y")
    val rd = ScoreEval.spearman(down, col("x"), col("y"))
      .collect().head.getDouble(1)
    assert(rd == rhoIeee(8, 8, 32) && math.abs(rd + 1.0) < 1e-12)
    val const = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("x", "y")
    assert(ScoreEval.spearman(const, col("x"), col("y"))
      .collect().head.getDouble(1) == 0.0)
  }

  test("spearman handles ties by midrank (hand-computed)") {
    // x=(1,1,2), y=(1,2,2): doubled midranks x->(3,3,6), y->(2,5,5);
    // d2 = 1+4+1 = 6; T = 6 each side; S4 = (24-6)/3 = 6;
    // rho = (6+6-6)/(2*sqrt(6)*sqrt(6)) = 0.5
    val df = Seq((1L, 1L), (1L, 2L), (2L, 2L)).toDF("x", "y")
    val r = ScoreEval.spearman(df, col("x"), col("y")).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == rhoIeee(6, 6, 6) &&
      math.abs(r.getDouble(1) - 0.5) < 1e-12)
  }

  test("spearman is invariant under monotone rescaling of either side") {
    val a = Seq((1L, 7L), (4L, 2L), (9L, 5L), (16L, 11L)).toDF("x", "y")
    val b = a.select((col("x") * 1000L).as("x"),
      (col("y") + 100L).as("y"))
    val ra = ScoreEval.spearman(a, col("x"), col("y"))
      .collect().head.getDouble(1)
    val rb = ScoreEval.spearman(b, col("x"), col("y"))
      .collect().head.getDouble(1)
    assert(ra == rb)
  }

  // --- TextAnalysis.ngramDiversity ------------------------------------

  test("ngramDiversity reproduces hand counts per group and order") {
    val docs = Seq(("A", "a b a"), ("A", "a b"), ("B", "x"))
      .toDF("source", "text")
    val rows = TextAnalysis.ngramDiversity(docs, col("source"),
      col("text"), maxN = 2).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B"))
    val a = rows(0)
    // tokens: a b a | a b -> 5 total, {a,b} distinct
    assert(a.getLong(1) == 5L && a.getLong(2) == 2L &&
      a.getDouble(3) == 0.4)
    // bigrams: "a b","b a" | "a b" -> 3 total, 2 distinct
    assert(a.getLong(4) == 3L && a.getLong(5) == 2L &&
      a.getDouble(6) == 2.0 / 3.0)
    val b = rows(1)
    // one token, no bigrams -> ratio_2 reports 0.0, never NaN
    assert(b.getLong(1) == 1L && b.getDouble(3) == 1.0)
    assert(b.getLong(4) == 0L && b.getLong(5) == 0L &&
      b.getDouble(6) == 0.0)
  }

  test("ngramDiversity flags the boilerplate source the per-doc filter misses") {
    // every spam doc is internally clean (no repeated bigram inside a
    // doc), but the SOURCE repeats one template
    val spam = (1 to 20).map(_ => ("spam", "buy cheap pills now"))
    val fresh = Seq(("fresh", "alpha beta gamma delta"),
      ("fresh", "epsilon zeta eta theta"),
      ("fresh", "iota kappa lambda mu"))
    val docs = (spam ++ fresh).toDF("source", "text")
    val out = TextAnalysis.ngramDiversity(docs, col("source"),
      col("text"), maxN = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(6)).toMap
    assert(out("fresh") == 1.0)
    assert(out("spam") == 3.0 / 60.0)
  }

  // --- Divergence.jsdFromMixture ----------------------------------------

  test("jsdFromMixture reproduces the hand micro-nat value on disjoint " +
      "sources and is symmetric") {
    // A: "x x", B: "y y" -> corpus mixture {x:.5, y:.5}; closed form
    // JSD(p_A, q) = 3/4·ln(4/3). Micro-nat mass: wp = floor(ln(4/3)
    // ·1e6+.5) = 287682 (x for A: c=2,n=2,C=2,N=4), wq = floor(
    // ln(2/3)·1e6+.5) = -405465, absent mass (4-2)·693147 ->
    // jsd = (287682 + (-810930 + 1386294)/4) / 2e6
    val docs = Seq(("A", "x x"), ("B", "y y")).toDF("source", "text")
    val out = graft.text.Divergence.jsdFromMixture(docs, col("source"),
      col("text")).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A", "B"))
    val expected = (2.0 * 287682 / 2.0 +
      (2.0 * -405465 + 2.0 * 693147) / 4.0) / 2e6
    assert(out(0).getDouble(3) == expected)
    assert(out(1).getDouble(3) == out(0).getDouble(3),
      "mirror-image sources must diverge equally from the mixture")
    assert(math.abs(out(0).getDouble(3) - 0.75 * math.log(4.0 / 3.0)) < 1e-5,
      "micro-nat value must sit on the closed form")
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 1L)
  }

  test("jsdFromMixture: identical distributions and single source are 0.0") {
    val same = Seq(("A", "x y"), ("B", "x y")).toDF("source", "text")
    val outSame = graft.text.Divergence.jsdFromMixture(same, col("source"),
      col("text")).collect()
    assert(outSame.forall(_.getDouble(3) == 0.0),
      "a source matching the mixture exactly has zero divergence")
    val single = Seq(("A", "x y z x")).toDF("source", "text")
    val outSingle = graft.text.Divergence.jsdFromMixture(single,
      col("source"), col("text")).collect()
    assert(outSingle.head.getDouble(3) == 0.0)
    assert(outSingle.head.getLong(1) == 4L && outSingle.head.getLong(2) == 3L)
  }

  test("jsdFromMixture orders drift correctly and stays within (0, ln 2)") {
    // C drifts mildly (shared vocab, skewed), D is alien vocabulary
    val docs = Seq(
      ("base", "a b c d a b c d a b"),
      ("mild", "a a a a b b c d a a"),
      ("alien", "q r s t q r s t q r")).toDF("source", "text")
    val out = graft.text.Divergence.jsdFromMixture(docs, col("source"),
      col("text")).collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("alien") > out("mild"),
      s"alien vocabulary must out-diverge a skew: $out")
    assert(out.values.forall(v => v > 0.0 && v < math.log(2.0) + 1e-9),
      s"JSD is bounded by ln 2: $out")
  }

  // --- plan pins --------------------------------------------------------

  private def nodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val here = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        nodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        nodes(q.plan)
      case _ => Seq(p)
    }
    here ++ p.children.flatMap(nodes) ++ p.subqueries.flatMap(nodes)
  }

  test("ngramDiversity plan: every order rides ONE corpus scan, no join") {
    val docs = Seq(("A", "a b c"), ("B", "d e")).toDF("source", "text")
    val df = TextAnalysis.ngramDiversity(docs, col("source"), col("text"), 2)
    df.collect()
    val ns = nodes(df.queryExecution.executedPlan)
    val scans = ns.count(
      _.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
    assert(scans == 1, s"expected one corpus scan, found $scans")
    assert(!ns.exists(_.nodeName.toLowerCase.contains("join")),
      "the tagged-explode census needs no join")
  }

  test("rocAuc plan: census-shaped, no cartesian/nested-loop anywhere") {
    val df = Seq((3L, 1L), (2L, 0L), (1L, 0L)).toDF("s", "y")
    val plan = ScoreEval.rocAuc(df, col("s"), col("y"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"rocAuc must stay census-aggregate shaped:\n$plan")
  }

  // --- ScoreEval.ksTest -------------------------------------------------

  test("ksTest reproduces the hand-computed sup-CDF gap and its location") {
    // a = {1,2,3}, b = {3,4}: masses over n_a·n_b = 6 are
    // s=1: 2, s=2: 4, s=3: |6−3| = 3, s=4: 0 → D = 4/6 at s = 2
    val df = Seq((1L, 0L), (2L, 0L), (3L, 0L), (3L, 1L), (4L, 1L))
      .toDF("s", "g")
    val r = ScoreEval.ksTest(df, col("s"), col("g")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 4.0 / 6.0)
    assert(r.getLong(3) == 2L)
  }

  test("ksTest: identical distributions give d = 0 at the smallest score") {
    val df = Seq((1L, 0L), (2L, 0L), (1L, 1L), (2L, 1L)).toDF("s", "g")
    val r = ScoreEval.ksTest(df, col("s"), col("g")).collect().head
    assert(r.getDouble(2) == 0.0 && r.getLong(3) == 1L)
  }

  test("ksTest: disjoint supports give d = 1.0; single population 0.0") {
    val disjoint = Seq((1L, 0L), (2L, 0L), (5L, 1L), (6L, 1L)).toDF("s", "g")
    val r = ScoreEval.ksTest(disjoint, col("s"), col("g")).collect().head
    assert(r.getDouble(2) == 1.0 && r.getLong(3) == 2L)
    val single = Seq((1L, 0L), (2L, 0L)).toDF("s", "g")
    val s = ScoreEval.ksTest(single, col("s"), col("g")).collect().head
    assert(s.getLong(0) == 2L && s.getLong(1) == 0L && s.getDouble(2) == 0.0)
  }

  test("ksTest refuses a non-binary group loudly") {
    val df = Seq((1L, 2L)).toDF("s", "g")
    val e = intercept[Exception] {
      ScoreEval.ksTest(df, col("s"), col("g")).collect()
    }
    assert(e.getMessage.contains("must be 0 or 1"))
  }

  // --- Agreement.matthewsCorrelation ------------------------------------

  test("matthewsCorrelation: binary case equals textbook MCC") {
    // tp=4 fn=1 fp=2 tn=3 → MCC = (4·3 − 2·1)/√(6·5·5·4) = 10/√600;
    // the engine's Gorodkin form: num=20, dx=48, dy=50 — same value
    val rows = Seq.fill(4)(("p", "p")) ++ Seq.fill(1)(("p", "n")) ++
      Seq.fill(2)(("n", "p")) ++ Seq.fill(3)(("n", "n"))
    val df = rows.toDF("gold", "pred")
    val r = graft.ops.Agreement.matthewsCorrelation(df, col("gold"),
      col("pred")).collect().head
    assert(r.getLong(0) == 10L)
    assert(r.getDouble(1) == 20.0 / (math.sqrt(48.0) * math.sqrt(50.0)))
  }

  test("matthewsCorrelation: perfect 1.0, constant labeler 0.0, multiclass") {
    // class sizes (1,2,2): radicands 25−9 = 16 — an exact square, so
    // the fixed √·√ sequence lands on 1.0 exactly. (With inexact-root
    // radicands a perfect labeler reads 1±1ulp — the documented price
    // of the bit-portable op order.)
    val perfect = Seq(("a", "a"), ("b", "b"), ("b", "b"), ("c", "c"),
      ("c", "c")).toDF("gold", "pred")
    assert(graft.ops.Agreement.matthewsCorrelation(perfect, col("gold"),
      col("pred")).collect().head.getDouble(1) == 1.0)
    // the 1-ulp case, pinned to the exact fixed sequence
    val p3 = Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("gold", "pred")
    assert(graft.ops.Agreement.matthewsCorrelation(p3, col("gold"),
        col("pred")).collect().head.getDouble(1) ==
      6.0 / (math.sqrt(6.0) * math.sqrt(6.0)))
    // constant pred → zero pred-marginal radicand → 0.0, never NaN
    val const = Seq(("a", "a"), ("b", "a"), ("c", "a")).toDF("gold", "pred")
    assert(graft.ops.Agreement.matthewsCorrelation(const, col("gold"),
      col("pred")).collect().head.getDouble(1) == 0.0)
    // 3-class with one confusion: trace=5, N=6, t=(2,2,2), p=(3,2,1)
    // → num=18, dx=22, dy=24
    val m = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"),
      ("c", "c"), ("c", "a")).toDF("gold", "pred")
    assert(graft.ops.Agreement.matthewsCorrelation(m, col("gold"),
        col("pred")).collect().head.getDouble(1) ==
      18.0 / (math.sqrt(22.0) * math.sqrt(24.0)))
  }

  test("matthewsCorrelation flags majority-class gaming that kappa softens") {
    // 9 of 10 gold 'a': predicting all-'a' scores 90% accuracy but
    // carries zero correlation
    val rows = Seq.fill(9)(("a", "a")) :+ (("b", "a"))
    val r = graft.ops.Agreement.matthewsCorrelation(rows.toDF("gold", "pred"),
      col("gold"), col("pred")).collect().head
    assert(r.getDouble(1) == 0.0)
  }

  // --- Vocab.vocabCoverage ------------------------------------------------

  test("vocabCoverage reproduces hand counts, Good–Turing, and Chao1") {
    val docs = Seq(("g1", "a a b c"), ("g1", "a d"), ("g2", "x x"))
      .toDF("source", "text")
    val rows = graft.text.Vocab.vocabCoverage(docs, col("source")).collect()
    assert(rows.length == 2)
    val g1 = rows(0)
    // g1: a×3, b/c/d singletons → V=4, N=6, n1=3, n2=0
    assert(g1.getString(0) == "g1" && g1.getLong(1) == 4L &&
      g1.getLong(2) == 6L && g1.getLong(3) == 3L && g1.getLong(4) == 0L)
    assert(g1.getDouble(5) == 0.5)           // (6−3)/6
    assert(g1.getDouble(6) == 4.0 + 6.0 / 2.0) // V + n1(n1−1)/(2(n2+1))
    val g2 = rows(1)
    // g2: x doubleton → full coverage, Chao1 = V
    assert(g2.getLong(1) == 1L && g2.getLong(4) == 1L)
    assert(g2.getDouble(5) == 1.0 && g2.getDouble(6) == 1.0)
  }

  test("vocabCoverage: an all-singleton group reports coverage 0.0") {
    val docs = Seq(("g", "a b c")).toDF("source", "text")
    val r = graft.text.Vocab.vocabCoverage(docs, col("source"))
      .collect().head
    assert(r.getDouble(5) == 0.0)
    // bias-corrected Chao1 stays finite with n2 = 0: 3 + 3·2/2 = 6
    assert(r.getDouble(6) == 6.0)
  }

  // --- ScoreEval.logLoss --------------------------------------------------

  test("logLoss reproduces hand micro-nat values and the census mean") {
    // conf 500 on a hit: −ln(0.5) → 693147 micro-nats exactly
    val half = Seq((500L, 1L)).toDF("conf", "y")
    assert(ScoreEval.logLoss(half, col("conf"), col("y"))
      .collect().head.getDouble(1) == 693147.0 / 1e6)
    // mixed census: (500, hit) + (250, miss → p_true = 750)
    // → (693147 + 287682) / 2e6
    val mixed = Seq((500L, 1L), (250L, 0L)).toDF("conf", "y")
    assert(ScoreEval.logLoss(mixed, col("conf"), col("y"))
      .collect().head.getDouble(1) == (693147.0 + 287682.0) / 2e6)
  }

  test("logLoss diverges on certain-and-wrong where Brier saturates") {
    // conf 999 wrong: p_true = 1 milli → ~6.91 nats, vs Brier's cap
    // at ~1.0 — the unbounded penalty is the point of the rule
    val cw = Seq((999L, 0L)).toDF("conf", "y")
    val ll = ScoreEval.logLoss(cw, col("conf"), col("y"))
      .collect().head.getDouble(1)
    assert(ll == 6907755.0 / 1e6)
    val br = ScoreEval.brier(cw, col("conf"), col("y"))
      .collect().head.getDouble(1)
    assert(ll > 5.0 && br < 1.0)
  }

  test("logLoss refuses claimed certainty and non-binary outcomes") {
    for (bad <- Seq(0L, 1000L)) {
      val e = intercept[Exception] {
        ScoreEval.logLoss(Seq((bad, 1L)).toDF("conf", "y"),
          col("conf"), col("y")).collect()
      }
      assert(e.getMessage.contains("[1,999]"), e.getMessage)
    }
    val e2 = intercept[Exception] {
      ScoreEval.logLoss(Seq((500L, 2L)).toDF("conf", "y"),
        col("conf"), col("y")).collect()
    }
    assert(e2.getMessage.contains("must be 0 or 1"))
  }

  // --- VectorSearch.embeddingDrift ---------------------------------------

  test("embeddingDrift: orthogonal, opposite, aligned, and lone groups") {
    import graft.vector.VectorSearch
    // orthogonal slices: g1 along e1, g2 along e2 → cos_rest = 0 both
    val ortho = Seq((1, Seq(1.0f, 0.0f)), (2, Seq(0.0f, 1.0f)))
      .toDF("label", "embedding")
    val o = VectorSearch.embeddingDrift(ortho).collect()
    assert(o.map(_.getDouble(2)).toSeq == Seq(0.0, 0.0))
    assert(o.map(_.getLong(1)).toSeq == Seq(1L, 1L))
    // opposite directions → exactly −1.0 (1e12 radicands are exact
    // squares of exact doubles)
    val opp = Seq((1, Seq(1.0f, 0.0f)), (2, Seq(-1.0f, 0.0f)))
      .toDF("label", "embedding")
    assert(VectorSearch.embeddingDrift(opp).collect()
      .map(_.getDouble(2)).toSeq == Seq(-1.0, -1.0))
    // same direction, different mass → exactly 1.0
    val same = Seq((1, Seq(1.0f, 0.0f)), (2, Seq(1.0f, 0.0f)),
      (2, Seq(1.0f, 0.0f))).toDF("label", "embedding")
    val s = VectorSearch.embeddingDrift(same).collect()
    assert(s.map(_.getDouble(2)).toSeq == Seq(1.0, 1.0))
    assert(s.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    // a single group has an empty rest → 0.0, never NaN
    val lone = Seq((1, Seq(1.0f, 2.0f))).toDF("label", "embedding")
    assert(VectorSearch.embeddingDrift(lone).collect()
      .head.getDouble(2) == 0.0)
  }

  test("embeddingDrift flags the divergent slice a cohesion stat misses") {
    import graft.vector.VectorSearch
    // three mainstream groups share a direction; the fourth points
    // elsewhere — drift must single it out
    val emb = Seq(
      (1, Seq(1.0f, 0.1f)), (1, Seq(1.0f, 0.2f)),
      (2, Seq(0.9f, 0.1f)), (3, Seq(1.0f, 0.0f)),
      (4, Seq(-0.1f, 1.0f)), (4, Seq(0.0f, 1.0f))
    ).toDF("label", "embedding")
    val r = VectorSearch.embeddingDrift(emb).collect()
      .map(x => x.getInt(0) -> x.getDouble(2)).toMap
    assert(Seq(1, 2, 3).forall(g => r(g) > 0.5),
      s"mainstream groups must align with the rest: $r")
    assert(r(4) < 0.5, s"the divergent slice must read low: $r")
  }

  test("ksTest plan: no cartesian; the only nested loop is the 1-row " +
      "broadcast of the global counts") {
    val df = Seq((1L, 0L), (2L, 1L)).toDF("s", "g")
    val plan = ScoreEval.ksTest(df, col("s"), col("g"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"ksTest must stay census-aggregate shaped:\n$plan")
    assert(!plan.replace("BroadcastNestedLoopJoin", "")
        .contains("NestedLoopJoin"),
      s"any nested loop must be the broadcast-globals one:\n$plan")
  }
}
