package graft

import graft.ops.{PrefixSum, ScoreEval}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-14 batch: prefix-sum output-name
  * guards, multiclass calibration / per-class PR-AUC, and the
  * per-source KS drift matrix.
  */
class NewOps15Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- PrefixSum output-name guards --------------------------------------

  test("withRunningTotals refuses duplicate or scratch-colliding " +
    "output names instead of silently dropping a running total") {
    val df = Seq((1L, 2L), (2L, 3L)).toDF("k", "v")
    // duplicate out names: the foldLeft's withColumn would replace
    // the first running total with the second, no error
    val dup = intercept[IllegalArgumentException] {
      PrefixSum.withRunningTotals(df, Seq(col("k")),
        Seq(col("v") -> "cum", col("v") -> "cum"))
    }
    assert(dup.getMessage.contains("distinct"))
    // scratch collisions: __pid / __runN are claimed by the two-phase
    // pass itself
    val pid = intercept[IllegalArgumentException] {
      PrefixSum.withRunningTotals(df, Seq(col("k")),
        Seq(col("v") -> "__pid"))
    }
    assert(pid.getMessage.contains("scratch"))
    val run = intercept[IllegalArgumentException] {
      PrefixSum.withRunningTotals(df, Seq(col("k")),
        Seq(col("v") -> "a", col("v") -> "__run0"))
    }
    assert(run.getMessage.contains("scratch"))
    // distinct sane names still work
    assert(PrefixSum.withRunningTotals(df, Seq(col("k")),
      Seq(col("v") -> "c1", col("v") -> "c2")).count() == 2)
  }

  // --- Bench wall-clock budget ladder -------------------------------------

  test("bench planLevel: comfortable budget stays on the official " +
    "protocol; projected overrun degrades stepwise; only an " +
    "unaffordable NEXT child truncates") {
    // 100 queries left, 25 s/child, 300 s spent, 3600 s budget:
    // 100*25+300 = 2800 < 3600 — stay at full-reps3
    assert(Bench.planLevel(0, 100, 300.0, 25.0, 3600.0) == 0)
    // same sweep, 1200 s budget: full projects 2800 > 1200;
    // reps1 projects 300+100*18.75 = 2175 > 1200;
    // group4 projects 300+25*(25*0.4*4) = 1300 > 1200 — but the next
    // grouped child (40 s) fits, so run grouped, don't truncate
    assert(Bench.planLevel(0, 100, 300.0, 25.0, 1200.0) == 2)
    // budget nearly gone: even one grouped child (25*0.4*4 = 40 s)
    // does not fit in the 30 s remaining — truncate (= Levels.size)
    assert(Bench.planLevel(2, 50, 1170.0, 25.0, 1200.0) ==
      Bench.Levels.size)
    // monotone: an already-degraded level never de-escalates even if
    // the projection would now fit
    assert(Bench.planLevel(2, 2, 10.0, 25.0, 3600.0) == 2)
    // mid-ladder: reps1 fits -> stop there
    // full: 300+100*25 = 2800 > 2500; reps1: 300+1875 = 2175 <= 2500
    assert(Bench.planLevel(0, 100, 300.0, 25.0, 2500.0) == 1)
  }

  // --- multiclass calibration / per-class PR-AUC ---------------------------

  // 4 docs, 2 classes, gold + a full milli-unit claim per class
  private def mcFixture = Seq(
    ("A", 900L), ("B", 300L), ("A", 600L), ("A", 200L))
    .toDF("gold", "a_conf")
    .select(col("gold"),
      map(lit("A"), col("a_conf"), lit("B"), lit(1000L) - col("a_conf"))
        .as("conf"))

  test("calibrationByClass: hand-computed per-class bins and ECE") {
    val got = ScoreEval.calibrationByClass(mcFixture, col("conf"),
      col("gold"), bins = 10).collect()
    // class A claims: 900(ok) b9, 300(miss) b3, 600(ok) b6, 200(ok) b2
    // gaps: |1000-900| + |0-300| + |1000-600| + |1000-200| -> 1600/4000
    val aRows = got.filter(_.getString(0) == "A")
    assert(aRows.map(_.getAs[Long]("bin")).toSeq == Seq(2L, 3L, 6L, 9L))
    assert(aRows.forall(r => math.abs(r.getAs[Double]("ece") - 0.4) < 1e-12))
    val a9 = aRows.find(_.getAs[Long]("bin") == 9L).get
    assert(a9.getAs[Long]("n") == 1 && a9.getAs[Long]("n_correct") == 1 &&
      a9.getAs[Long]("conf_sum_milli") == 900 &&
      a9.getAs[Double]("acc") == 1.0 &&
      math.abs(a9.getAs[Double]("conf_mean") - 0.9) < 1e-12)
    // class B claims: 100(miss) b1, 700(ok) b7, 400(miss) b4, 800(miss) b8
    // gaps: 100 + 300 + 400 + 800 -> 1600/4000
    val bRows = got.filter(_.getString(0) == "B")
    assert(bRows.map(_.getAs[Long]("bin")).toSeq == Seq(1L, 4L, 7L, 8L))
    assert(bRows.forall(r => math.abs(r.getAs[Double]("ece") - 0.4) < 1e-12))
  }

  test("averagePrecisionByClass: hand-computed per-class AP") {
    val got = ScoreEval.averagePrecisionByClass(mcFixture, col("conf"),
      col("gold")).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("A", "B"))
    val a = got(0); val b = got(1)
    // class A: scores 900+,300-,600+,200+ -> thresholds down:
    // 900: prec 1; 600: prec 1; 300: (pos) none; 200: 3/4
    // AP = (1e6 + 1e6 + 750000) / (3 * 1e6)
    assert(a.getAs[Long]("n_pos") == 3 && a.getAs[Long]("n_neg") == 1)
    assert(math.abs(a.getAs[Double]("ap") - 2750000.0 / 3000000.0) < 1e-15)
    // class B: scores 100-,700+,400-,800- -> the one positive sits
    // under a higher-claiming negative: AP = prec@700 = 1/2
    assert(b.getAs[Long]("n_pos") == 1 && b.getAs[Long]("n_neg") == 3)
    assert(math.abs(b.getAs[Double]("ap") - 0.5) < 1e-15)
  }

  test("rocAucByClass: hand-computed per-class Mann–Whitney; claim " +
    "ties midrank to 0.5") {
    val got = ScoreEval.rocAucByClass(mcFixture, col("conf"), col("gold"))
      .collect()
    assert(got.map(_.getString(0)).toSeq == Seq("A", "B"))
    // class A: positives 900,600,200 vs negative 300 -> 2 of 3 pairs
    // concordant; class B: positive 700 vs negatives 100,400,800 ->
    // 2 of 3
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("auc") - 2.0 / 3.0) < 1e-15,
        r.toString)
    }
    assert(got(0).getAs[Long]("n_pos") == 3 && got(0).getAs[Long]("n_neg") == 1)
    assert(got(1).getAs[Long]("n_pos") == 1 && got(1).getAs[Long]("n_neg") == 3)
    // both documents claim 500 for A, one is gold-A: a full tie
    // midranks to exactly 0.5
    val tied = Seq(("A", 500L), ("B", 500L)).toDF("gold", "a_conf")
      .select(col("gold"),
        map(lit("A"), col("a_conf"), lit("B"), lit(1000L) - col("a_conf"))
          .as("conf"))
    val t = ScoreEval.rocAucByClass(tied, col("conf"), col("gold")).collect()
    t.foreach(r => assert(r.getAs[Double]("auc") == 0.5, r.toString))
  }

  test("multiclass guards: unnormalized claim and out-of-range class " +
    "claim raise instead of grading garbage") {
    val bad = Seq(("A", 700L)).toDF("gold", "c")
      .select(col("gold"),
        map(lit("A"), col("c"), lit("B"), lit(200L)).as("conf"))
    val e = intercept[Exception] {
      ScoreEval.calibrationByClass(bad, col("conf"), col("gold")).collect()
    }
    assert(e.getMessage.contains("sum to exactly 1000"), e.getMessage)
    val e2 = intercept[Exception] {
      ScoreEval.averagePrecisionByClass(bad, col("conf"), col("gold"))
        .collect()
    }
    assert(e2.getMessage.contains("sum to exactly 1000"), e2.getMessage)
    // sums to 1000 but a negative per-class claim sneaks through the
    // total — the per-class range guard catches it
    val neg = Seq(("A", -100L)).toDF("gold", "c")
      .select(col("gold"),
        map(lit("A"), col("c"), lit("B"), lit(1100L)).as("conf"))
    val e3 = intercept[Exception] {
      ScoreEval.calibrationByClass(neg, col("conf"), col("gold")).collect()
    }
    assert(e3.getMessage.contains("[0,1000]"), e3.getMessage)
  }

  // --- every-source-vs-rest KS matrix --------------------------------------

  test("ksMatrix: hand-computed sup gaps; a group missing a score " +
    "value still steps at that jump point") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 5L),
      ("b", 2L), ("b", 3L)).toDF("grp", "s")
    val got = ScoreEval.ksMatrix(df, col("s"), col("grp")).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("a", "b"))
    // F_a: 1/4 @1, 3/4 @2, 1 @5; F_b: 1/2 @2, 1 @3
    // gaps at {1,2,3,5}: .25, .25, .25, 0 -> sup .25 at the SMALLEST s
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("d") - 0.25) < 1e-15, r.toString)
      assert(r.getAs[Long]("d_at") == 1L, r.toString)
    }
    assert(got(0).getAs[Long]("n_g") == 4 && got(0).getAs[Long]("n_rest") == 2)
    assert(got(1).getAs[Long]("n_g") == 2 && got(1).getAs[Long]("n_rest") == 4)
  }

  test("ksMatrix: two-group matrix agrees with the nominated-slice " +
    "ksTest, and a single-group corpus reports d = 0") {
    val df = Seq(("a", 10L), ("a", 20L), ("a", 20L), ("b", 15L),
      ("b", 30L), ("b", 30L), ("b", 40L)).toDF("grp", "s")
    val matrix = ScoreEval.ksMatrix(df, col("s"), col("grp")).collect()
    val two = ScoreEval.ksTest(df, col("s"),
      when(col("grp") === "a", lit(1L)).otherwise(lit(0L))).head()
    matrix.foreach { r =>
      assert(math.abs(r.getAs[Double]("d") - two.getAs[Double]("d")) < 1e-15)
      assert(r.getAs[Long]("d_at") == two.getAs[Long]("d_at"))
    }
    val solo = ScoreEval.ksMatrix(
      Seq(("only", 1L), ("only", 2L)).toDF("grp", "s"),
      col("s"), col("grp")).head()
    assert(solo.getAs[Double]("d") == 0.0 &&
      solo.getAs[Long]("n_rest") == 0L)
  }

  test("ksMatrix: null scores are excluded, a null group raises") {
    val df = Seq(("a", Some(1L)), ("a", None), ("b", Some(2L)))
      .toDF("grp", "s")
    val got = ScoreEval.ksMatrix(df, col("s"), col("grp")).collect()
    assert(got.map(r => r.getString(0) -> r.getAs[Long]("n_g")).toSeq ==
      Seq("a" -> 1L, "b" -> 1L))
    val nullGrp = Seq((Option.empty[String], 1L), (Some("b"), 2L))
      .toDF("grp", "s")
    val e = intercept[Exception] {
      ScoreEval.ksMatrix(nullGrp, col("s"), col("grp")).collect()
    }
    assert(e.getMessage.contains("population membership"), e.getMessage)
  }

  test("ksMatrix plan: the group x score grid is a BROADCAST nested " +
    "loop over census-sized frames — no CartesianProduct, no " +
    "corpus-sized pair join") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L))
      .toDF("grp", "s")
    val out = ScoreEval.ksMatrix(df, col("s"), col("grp"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "grid expansion must broadcast the group totals, not cartesian")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the census x groups grid rides a broadcast nested loop")
  }

  // --- vocab coverage from the JSD census ----------------------------------

  test("vocabCoverageFromCells over the token-JSD census equals the " +
    "batch vocabCoverage — one monitor leg, two faces") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val cells = graft.text.Divergence.jsdCensus(docs, col("source"),
      col("text"))
    val got = graft.text.Vocab.vocabCoverageFromCells(cells).collect()
    val want = graft.text.Vocab.vocabCoverage(docs, col("source")).collect()
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  // --- null-score exclusion vs the oracle ----------------------------------

  test("rocAuc with nulled scores equals rocAuc over the non-null rows") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val marker = size(filter(graft.text.TextAnalysis.tokens(col("text")),
      t => t === "the" || t === "a"))
    val label = when(col("lang") === "en", lit(1L)).otherwise(lit(0L))
    val nulled = when(col("doc_id") % 7 === 0, lit(null).cast("long"))
      .otherwise(marker)
    val got = ScoreEval.rocAuc(docs, nulled, label).collect()
    val want = ScoreEval.rocAuc(docs.filter(col("doc_id") % 7 =!= 0),
      marker, label).collect()
    assert(got.toSeq == want.toSeq)
  }
}
