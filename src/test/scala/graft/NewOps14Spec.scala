package graft

import graft.ops.{Agreement, PrefixSum, ScoreEval}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-13 consolidation batch: the
  * multi-column prefix-sum pass, null-score census semantics, the
  * null-safe guard diagnostics, the rec/f1 operating columns, and
  * the Matthews R_K column in the classifier report.
  */
class NewOps14Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- PrefixSum.withRunningTotals --------------------------------------

  test("withRunningTotals: one pass equals chained single-column calls") {
    val df = (1 to 500).map(i => (i.toLong, (i % 7).toLong, (i % 3).toLong))
      .toDF("k", "a", "b")
    val multi = PrefixSum.withRunningTotals(df, Seq(col("k")),
      Seq(col("a") -> "cum_a", col("b") -> "cum_b"))
      .orderBy("k").collect()
    val chained = PrefixSum.withRunningTotal(
        PrefixSum.withRunningTotal(df, Seq(col("k")), col("a"), "cum_a"),
        Seq(col("k")), col("b"), "cum_b")
      .orderBy("k").select("k", "a", "b", "cum_a", "cum_b").collect()
    val multiSel = PrefixSum.withRunningTotals(df, Seq(col("k")),
      Seq(col("a") -> "cum_a", col("b") -> "cum_b"))
      .orderBy("k").select("k", "a", "b", "cum_a", "cum_b").collect()
    assert(multiSel.toSeq == chained.toSeq)
    // and the running totals are the true global prefix sums
    var (ra, rb) = (0L, 0L)
    multi.foreach { r =>
      ra += r.getAs[Long]("a"); rb += r.getAs[Long]("b")
      assert(r.getAs[Long]("cum_a") == ra && r.getAs[Long]("cum_b") == rb)
    }
  }

  test("withRunningTotals drops no rows and keeps every input column") {
    val df = Seq((3L, 1L, "x"), (1L, 2L, "y"), (2L, 3L, "z"))
      .toDF("k", "v", "tag")
    val out = PrefixSum.withRunningTotals(df, Seq(col("k")),
      Seq(col("v") -> "c1", col("v") -> "c2"))
    assert(out.columns.toSeq == Seq("k", "v", "tag", "c1", "c2"))
    val rows = out.orderBy("k").collect()
    assert(rows.map(_.getString(2)).toSeq == Seq("y", "z", "x"))
    assert(rows.map(_.getAs[Long]("c1")).toSeq == Seq(2L, 5L, 6L))
    assert(rows.map(_.getAs[Long]("c2")).toSeq == Seq(2L, 5L, 6L))
  }

  // --- null-score census semantics ---------------------------------------

  test("rocAuc and ksTest exclude null scores (and count only graded rows)") {
    val withNulls = Seq((Some(3L), 1L), (None, 1L), (Some(2L), 1L),
      (Some(1L), 0L), (None, 0L), (Some(2L), 0L)).toDF("s", "y")
    val dense = Seq((3L, 1L), (2L, 1L), (1L, 0L), (2L, 0L)).toDF("s", "y")
    val a = ScoreEval.rocAuc(withNulls, col("s"), col("y")).collect().head
    val b = ScoreEval.rocAuc(dense, col("s"), col("y")).collect().head
    assert(a == b, s"null scores must be excluded: $a vs $b")
    val ksNulls = Seq((Some(1L), 0L), (None, 0L), (Some(2L), 0L),
      (Some(3L), 1L), (None, 1L), (Some(4L), 1L)).toDF("s", "g")
    val ksDense = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)).toDF("s", "g")
    assert(ScoreEval.ksTest(ksNulls, col("s"), col("g")).collect().head ==
      ScoreEval.ksTest(ksDense, col("s"), col("g")).collect().head)
  }

  test("null label / group / confidence still raise, with the value spelled") {
    val nullLabel = Seq((Some(1L), None: Option[Long])).toDF("s", "y")
    val e1 = intercept[Exception] {
      ScoreEval.rocAuc(nullLabel, col("s"), col("y")).collect()
    }
    assert(e1.getMessage.contains("must be 0 or 1") &&
      e1.getMessage.contains("null"),
      s"the diagnostic must survive a null label: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      ScoreEval.logLoss(Seq((None: Option[Long], 1L)).toDF("c", "y"),
        col("c"), col("y")).collect()
    }
    assert(e2.getMessage.contains("confMilli") &&
      e2.getMessage.contains("null"),
      s"the diagnostic must survive a null confidence: ${e2.getMessage}")
    val e3 = intercept[Exception] {
      ScoreEval.brier(Seq((None: Option[Long], 1L)).toDF("c", "y"),
        col("c"), col("y")).collect()
    }
    assert(e3.getMessage.contains("null"), e3.getMessage)
  }

  // --- rocCurve rec / f1 --------------------------------------------------

  test("rocCurve carries rec and f1 beside tpr/fpr/prec, hand-checked") {
    // census: s=1 (0 pos, 1 neg), s=2 (1 pos, 1 neg), s=3 (1 pos, 0 neg)
    val df = Seq((3L, 1L), (2L, 1L), (1L, 0L), (2L, 0L)).toDF("s", "y")
    val rows = ScoreEval.rocCurve(df, col("s"), col("y"))
      .select("thr", "tp", "fp", "fn", "rec", "f1").collect()
    // thr=1: tp=2 fp=2 fn=0 -> rec 1.0, f1 = 4/6
    assert(rows(0).getDouble(4) == 1.0 && rows(0).getDouble(5) == 4.0 / 6.0)
    // thr=2: tp=2 fp=1 fn=0 -> rec 1.0, f1 = 4/5
    assert(rows(1).getDouble(4) == 1.0 && rows(1).getDouble(5) == 4.0 / 5.0)
    // thr=3: tp=1 fp=0 fn=1 -> rec 0.5, f1 = 2/3
    assert(rows(2).getDouble(4) == 0.5 && rows(2).getDouble(5) == 2.0 / 3.0)
    // rec is numerically the tpr column at every threshold
    ScoreEval.rocCurve(df, col("s"), col("y")).collect().foreach { r =>
      assert(r.getAs[Double]("rec") == r.getAs[Double]("tpr"))
    }
  }

  test("rocCurve rec/f1 degenerate guards report 0.0, never NaN") {
    // all-negative input: every threshold has tp = 0 and fn = 0
    val df = Seq((1L, 0L), (2L, 0L)).toDF("s", "y")
    ScoreEval.rocCurve(df, col("s"), col("y")).collect().foreach { r =>
      assert(r.getAs[Double]("rec") == 0.0)
      val f1 = r.getAs[Double]("f1")
      assert(!f1.isNaN)
    }
  }

  // --- classifierReport mcc column ----------------------------------------

  test("classifierReport's mcc column equals matthewsCorrelation on both " +
    "the batch face and the cells face") {
    val rows = Seq.fill(40)(("en", "en")) ++ Seq.fill(8)(("en", "und")) ++
      Seq.fill(5)(("und", "en")) ++ Seq.fill(12)(("und", "und")) ++
      Seq.fill(3)(("fr", "en")) ++ Seq.fill(6)(("fr", "fr"))
    val df = rows.toDF("g", "p")
    val want = Agreement.matthewsCorrelation(df, col("g"), col("p"))
      .collect().head.getAs[Double]("mcc")
    val report = Agreement.classifierReport(df, col("g"), col("p")).collect()
    assert(report.nonEmpty)
    report.foreach(r => assert(r.getAs[Double]("mcc") == want,
      "the report's global mcc must be bit-identical to the standalone " +
        s"metric: ${r.getAs[Double]("mcc")} vs $want"))
    // binary sanity: for two classes the column IS textbook MCC
    val bin = (Seq.fill(6)(("p", "p")) ++ Seq.fill(2)(("p", "n")) ++
      Seq.fill(1)(("n", "p")) ++ Seq.fill(3)(("n", "n"))).toDF("g", "p")
    val tp = 6.0; val tn = 3.0; val fp = 1.0; val fn = 2.0
    val textbook = (tp * tn - fp * fn) /
      math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    val got = Agreement.classifierReport(bin, col("g"), col("p"))
      .collect().head.getAs[Double]("mcc")
    assert(math.abs(got - textbook) < 1e-12)
  }

  test("classifierReport mcc: constant labeler reports 0.0, never NaN") {
    val df = (Seq.fill(9)(("a", "a")) ++ Seq.fill(1)(("b", "a")))
      .toDF("g", "p")
    Agreement.classifierReport(df, col("g"), col("p")).collect()
      .foreach(r => assert(r.getAs[Double]("mcc") == 0.0))
  }

  // --- ScoreEval.kendallTauB ----------------------------------------------

  test("kendallTauB: perfect orders, hand-computed tie case, zero case") {
    // the two-root denominator carries the documented ±1-ulp caveat
    // (√6·√6 ≠ 6 exactly) — assert the FIXED IEEE sequence, the same
    // bit-portable value the oracle mirrors
    val perfect = 6.0 / (math.sqrt(6.0) * math.sqrt(6.0))
    val conc = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    assert(ScoreEval.kendallTauB(conc, col("x"), col("y"))
      .collect().head.getDouble(1) == perfect)
    val disc = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    assert(ScoreEval.kendallTauB(disc, col("x"), col("y"))
      .collect().head.getDouble(1) == -perfect)
    // C=1 D=1 with two y-ties and one x-tie -> exactly 0
    val bal = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("x", "y")
    val r = ScoreEval.kendallTauB(bal, col("x"), col("y")).collect().head
    assert(r.getLong(0) == 4L && r.getDouble(1) == 0.0)
  }

  test("kendallTauB: tie-corrected value matches the hand formula") {
    // x=[1,2,2,3], y=[1,3,2,4]: C=5, D=0, x-ties 1 pair, no y-ties
    // tau_b = 2*5 / (sqrt(4*3-2) * sqrt(4*3)) = 10/sqrt(120)
    val df = Seq((1L, 1L), (2L, 3L), (2L, 2L), (3L, 4L)).toDF("x", "y")
    val r = ScoreEval.kendallTauB(df, col("x"), col("y")).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 10.0 / (math.sqrt(10.0) * math.sqrt(12.0)))
  }

  test("kendallTauB: constant column reports 0.0; null pairs are excluded") {
    val const = Seq((1L, 5L), (1L, 7L), (1L, 9L)).toDF("x", "y")
    assert(ScoreEval.kendallTauB(const, col("x"), col("y"))
      .collect().head.getDouble(1) == 0.0)
    val withNulls = Seq((Some(1L), Some(1L)), (None, Some(2L)),
      (Some(2L), None), (Some(2L), Some(2L)), (Some(3L), Some(3L)))
      .toDF("x", "y")
    val dense = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    assert(ScoreEval.kendallTauB(withNulls, col("x"), col("y"))
        .collect().head ==
      ScoreEval.kendallTauB(dense, col("x"), col("y")).collect().head)
  }

  test("kendallTauB refuses a joint census past the pair-join bound") {
    val big = spark.range(40000).selectExpr("id AS x", "id AS y")
    val e = intercept[IllegalArgumentException] {
      ScoreEval.kendallTauB(big, col("x"), col("y")).collect()
    }
    assert(e.getMessage.contains("quantize"), e.getMessage)
  }

  // --- ScoreEval.logLossMulti ---------------------------------------------

  test("logLossMulti reproduces the hand-computed micro-nat masses") {
    val rows = Seq(
      ("a", Map("a" -> 500L, "b" -> 300L, "c" -> 200L)),
      ("b", Map("a" -> 100L, "b" -> 800L, "c" -> 100L)))
    val df = rows.toDF("gold", "conf")
    val r = ScoreEval.logLossMulti(df, col("conf"), col("gold"))
      .collect().head
    // m(500) = floor(-ln(0.5)*1e6+0.5) = 693147; m(800) = 223144
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == (693147.0 + 223144.0) / 2e6)
  }

  test("logLossMulti refuses unnormalized vectors, absent gold, and " +
    "claimed certainty — loudly, with the values spelled") {
    val bad1 = Seq(("a", Map("a" -> 500L, "b" -> 400L))).toDF("gold", "conf")
    val e1 = intercept[Exception] {
      ScoreEval.logLossMulti(bad1, col("conf"), col("gold")).collect()
    }
    assert(e1.getMessage.contains("sum=900"), e1.getMessage)
    val bad2 = Seq(("z", Map("a" -> 500L, "b" -> 500L))).toDF("gold", "conf")
    val e2 = intercept[Exception] {
      ScoreEval.logLossMulti(bad2, col("conf"), col("gold")).collect()
    }
    assert(e2.getMessage.contains("gold claim=null"), e2.getMessage)
    val bad3 = Seq(("a", Map("a" -> 1000L))).toDF("gold", "conf")
    val e3 = intercept[Exception] {
      ScoreEval.logLossMulti(bad3, col("conf"), col("gold")).collect()
    }
    assert(e3.getMessage.contains("gold claim=1000"), e3.getMessage)
  }

  test("logLossMulti agrees with binary logLoss on a two-class vector") {
    // binary logLoss(conf, y): claimed P(positive) = conf; multiclass
    // with map(pos -> conf, neg -> 1000-conf) and gold in {pos, neg}
    // reads the same p_true per row
    val rows = Seq((700L, 1L), (700L, 0L), (250L, 1L), (999L, 1L))
    val bin = rows.toDF("conf", "y")
    val want = ScoreEval.logLoss(bin, col("conf"), col("y"))
      .collect().head
    val multi = rows.map { case (c, yy) =>
      (if (yy == 1L) "pos" else "neg", Map("pos" -> c, "neg" -> (1000L - c)))
    }.toDF("gold", "conf")
    val got = ScoreEval.logLossMulti(multi, col("conf"), col("gold"))
      .collect().head
    assert(got == want)
  }
}
