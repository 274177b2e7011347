package graft

import graft.ops.ScoreEval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-15 batch: the per-class operating-
  * point table, the largest-remainder milli-quantizer, the FromCells
  * faces of the multiclass battery, and the ksMatrix single-action
  * guard.
  */
class NewOps16Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the NewOps15Spec multiclass fixture: 4 docs, 2 classes, a full
  // milli-unit claim per class
  private def mcFixture = Seq(
    ("A", 900L), ("B", 300L), ("A", 600L), ("A", 200L))
    .toDF("gold", "a_conf")
    .select(col("gold"),
      map(lit("A"), col("a_conf"), lit("B"), lit(1000L) - col("a_conf"))
        .as("conf"))

  // --- per-class operating points ------------------------------------------

  test("operatingPointsByClass: hand-computed per-(class, threshold) " +
    "confusion counts and rates") {
    val got = ScoreEval.operatingPointsByClass(mcFixture, col("conf"),
      col("gold")).collect()
    // class A claims: 900+, 300-, 600+, 200+ (4 observed thresholds);
    // class B claims: 100-, 700+, 400-, 800- (4 more)
    assert(got.length == 8)
    assert(got.map(_.getString(0)).toSeq ==
      Seq.fill(4)("A") ++ Seq.fill(4)("B"))
    def row(cls: String, thr: Long) =
      got.find(r => r.getString(0) == cls && r.getAs[Long]("thr") == thr).get
    // A@600: predict A when claim >= 600 -> tp {900,600}, fp {},
    // fn {200}, tn {300}
    val a600 = row("A", 600L)
    assert(a600.getAs[Long]("tp") == 2 && a600.getAs[Long]("fp") == 0 &&
      a600.getAs[Long]("fn") == 1 && a600.getAs[Long]("tn") == 1)
    assert(a600.getAs[Double]("prec") == 1.0)
    assert(math.abs(a600.getAs[Double]("rec") - 2.0 / 3.0) < 1e-15)
    assert(math.abs(a600.getAs[Double]("f1") - 0.8) < 1e-15)
    // A@200 (loosest observed): everything predicted positive
    val a200 = row("A", 200L)
    assert(a200.getAs[Long]("tp") == 3 && a200.getAs[Long]("fp") == 1 &&
      a200.getAs[Long]("fn") == 0 && a200.getAs[Long]("tn") == 0)
    assert(a200.getAs[Double]("tpr") == 1.0 &&
      a200.getAs[Double]("fpr") == 1.0)
    assert(math.abs(a200.getAs[Double]("prec") - 0.75) < 1e-15)
    assert(math.abs(a200.getAs[Double]("f1") - 6.0 / 7.0) < 1e-15)
    // B@800 (strictest): the one positive (700) is BELOW it — zero
    // tp, prec = 0/1 (an observed threshold always predicts its own
    // rows positive, so the divisor is never 0)
    val b800 = row("B", 800L)
    assert(b800.getAs[Long]("tp") == 0 && b800.getAs[Long]("fp") == 1 &&
      b800.getAs[Long]("fn") == 1 && b800.getAs[Long]("tn") == 2)
    assert(b800.getAs[Double]("prec") == 0.0 &&
      b800.getAs[Double]("rec") == 0.0 && b800.getAs[Double]("f1") == 0.0)
    // B@700: tp 1, fp 1 (800), fn 0, tn 2
    val b700 = row("B", 700L)
    assert(b700.getAs[Long]("tp") == 1 && b700.getAs[Long]("fp") == 1)
    assert(math.abs(b700.getAs[Double]("f1") - 2.0 / 3.0) < 1e-15)
  }

  test("operatingPointsByClass row-matches binary rocCurve run " +
    "one-vs-rest per class") {
    val perClass = ScoreEval.operatingPointsByClass(mcFixture, col("conf"),
      col("gold")).collect()
    Seq("A", "B").foreach { cls =>
      val flat = mcFixture.select(
        element_at(col("conf"), cls).as("s"),
        when(col("gold") === cls, lit(1L)).otherwise(lit(0L)).as("y"))
      val want = ScoreEval.rocCurve(flat, col("s"), col("y")).collect()
      val gotCls = perClass.filter(_.getString(0) == cls)
        .map(r => r.toSeq.drop(1)) // drop the cls column
      assert(gotCls.toSeq == want.map(_.toSeq).toSeq,
        s"class $cls operating points must equal the binary curve")
    }
  }

  test("multiclass FromCells faces equal their batch twins over the " +
    "shared census — one code path for monitor drains") {
    val census = ScoreEval.classScoreCensus(mcFixture, col("conf"),
      col("gold"))
    assert(ScoreEval.rocAucByClassFromCells(census).collect().toSeq ==
      ScoreEval.rocAucByClass(mcFixture, col("conf"), col("gold"))
        .collect().toSeq)
    assert(ScoreEval.averagePrecisionByClassFromCells(census)
        .collect().toSeq ==
      ScoreEval.averagePrecisionByClass(mcFixture, col("conf"), col("gold"))
        .collect().toSeq)
    assert(ScoreEval.operatingPointsByClassFromCells(census)
        .collect().toSeq ==
      ScoreEval.operatingPointsByClass(mcFixture, col("conf"), col("gold"))
        .collect().toSeq)
  }

  // --- largest-remainder quantizer -----------------------------------------

  private def quantize(m: Map[String, Double]): Map[String, Long] = {
    val entries = m.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    Seq(1).toDF("one")
      .select(ScoreEval.quantizeMilli(map(entries: _*)).as("q"))
      .head().getMap[String, Long](0).toMap
  }

  test("quantizeMilli: exact thirds split largest-remainder with the " +
    "tie toward the smallest class key") {
    assert(quantize(Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)) ==
      Map("a" -> 500L, "b" -> 300L, "c" -> 200L))
    // 1/3 each: floors 333+333+333, deficit 1, remainders tie exactly
    // (same double per entry) -> the smallest key takes the unit
    assert(quantize(Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)) ==
      Map("a" -> 334L, "b" -> 333L, "c" -> 333L))
    // normalization is by the vector's own sum — an unnormalized
    // claim is still a shape claim
    assert(quantize(Map("x" -> 2.0, "y" -> 6.0)) ==
      Map("x" -> 250L, "y" -> 750L))
    // the largest remainder wins the deficit unit regardless of key
    // order: 0.1245/0.8755 -> 124.5/875.5 floors 124+875, deficit 1;
    // both remainders .5 -> tie -> 'a'; asymmetric case below
    assert(quantize(Map("a" -> 0.0101, "b" -> 0.9899)) ==
      Map("a" -> 10L, "b" -> 990L))
  }

  test("quantizeMilli output satisfies the sum-to-1000 contract the " +
    "multiclass faces enforce") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val probs = map(
      lit("c0"), (lit(1L) + pmod(col("doc_id") * 7, lit(499L))) / lit(1237.0),
      lit("c1"), (lit(1L) + pmod(col("doc_id") * 13, lit(401L))) / lit(1237.0),
      lit("c2"), (lit(1L) + pmod(col("doc_id") * 29, lit(307L))) / lit(1237.0))
    val q = ScoreEval.quantizeMilli(probs)
    val sums = docs.select(aggregate(map_values(q), lit(0L),
      (acc, v) => acc + v).as("t")).distinct().collect()
    assert(sums.map(_.getLong(0)).toSeq == Seq(1000L))
    // and the faces accept it without raising
    assert(ScoreEval.rocAucByClass(docs, q,
      concat(lit("c"), pmod(col("n_chars"), lit(3L)).cast("string")))
      .collect().length == 3)
  }

  test("quantizeMilli refuses negative, null, NaN claims and a " +
    "non-positive total — no silent repair") {
    def expectRaise(m: Seq[(String, Any)], fragment: String): Unit = {
      val entries = m.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
      val e = intercept[Exception] {
        Seq(1).toDF("one")
          .select(ScoreEval.quantizeMilli(map(entries: _*))).collect()
      }
      assert(e.getMessage.contains(fragment),
        s"${e.getMessage} should mention $fragment")
    }
    expectRaise(Seq("a" -> -0.1, "b" -> 1.1), "non-negative")
    expectRaise(Seq("a" -> null, "b" -> 1.0), "non-negative")
    expectRaise(Seq("a" -> Double.NaN, "b" -> 1.0), "non-negative")
    expectRaise(Seq("a" -> 0.0, "b" -> 0.0), "positive")
  }

  // --- ksMatrix single-action guard ----------------------------------------

  test("ksMatrixFromCells runs ONE driver action beyond the census " +
    "checkpoint — the monitor drains this per report") {
    val census = Seq(("a", 1L, 2L), ("a", 2L, 1L), ("b", 2L, 3L),
      ("b", 3L, 1L)).toDF("grp", "s", "c")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    // settle any straggler events from earlier tests before counting
    Thread.sleep(300)
    spark.sparkContext.addSparkListener(listener)
    try {
      ScoreEval.ksMatrixFromCells(census) // plan construction only
      // listener events are async: wait for the count to go quiet
      var last = -1
      var spins = 0
      while (jobs.get() != last && spins < 40) {
        last = jobs.get(); Thread.sleep(100); spins += 1
      }
      // localCheckpoint materializes the census (its shuffle may
      // split into a couple of jobs under AQE) + exactly ONE header
      // action for guard cardinalities and the corpus total. The
      // pre-r15 shape ran two count()s and a head() — three extra
      // actions — and reliably exceeded this bound.
      assert(jobs.get() <= 4,
        s"expected <= 4 jobs (checkpoint + one header action), " +
          s"got ${jobs.get()}")
      assert(jobs.get() >= 2, "the checkpoint and header must both run")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
