package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-evaluation report: per-class confusion-derived metrics
  * plus chance-corrected global agreement (Cohen's kappa).
  *
  * The pipeline grows heuristic labelers (language ID, quality
  * classifiers, NB routing — q21/q118/q127); before one of them
  * gates a 100 TB curation run, its agreement with gold labels (or
  * with another labeler) needs a number that survives class
  * imbalance — raw accuracy does not (a 95%-English corpus gives any
  * constant-'en' labeler 95% accuracy; kappa gives it 0).
  *
  * Determinism: every count is an exact integer; each metric is ONE
  * IEEE-correctly-rounded double division of exact integers (the
  * q149 retrievalEval convention), so results hash-match any engine
  * computing the same formula. Kappa's cross terms use
  * DECIMAL(38,0): with row counts up to ~1e14 the products reach
  * ~1e28 — far past BIGINT, comfortably inside 38 digits.
  *
  * Scale shape: ONE map-side-combined aggregate over the corpus
  * produces the (gold, pred) confusion matrix — a classes²-sized
  * frame; everything after (marginals, kappa cross term, per-class
  * joins) touches only that census, so the driver never sees a
  * corpus-sized structure and the corpus is scanned exactly once.
  */
object Agreement {

  /** One row per class (the union of gold and predicted values):
    * `(cls, tp, fp, fn, prec, rec, f1, accuracy, kappa)` — accuracy
    * and kappa are global, repeated per row for a flat schema.
    * Zero-denominator metrics (class never predicted / never gold /
    * constant labeler) are 0.0, not null.
    */
  def classifierReport(df: DataFrame, gold: Column, pred: Column)
      : DataFrame = {
    val cm = df.select(gold.as("gold"), pred.as("pred"))
      .groupBy(col("gold"), col("pred")).agg(count(lit(1)).as("n"))
    val goldMarg = cm.groupBy(col("gold").as("cls"))
      .agg(sum(col("n")).as("n_gold"))
    val predMarg = cm.groupBy(col("pred").as("cls"))
      .agg(sum(col("n")).as("n_pred"))
    val classes = goldMarg.select(col("cls"))
      .union(predMarg.select(col("cls"))).distinct()
    val diag = cm.filter(col("gold") === col("pred"))
      .select(col("gold").as("cls"), col("n").as("tp0"))

    val dec = "decimal(38,0)"
    // global census: N, diagonal mass, and the chance cross term
    // Σ_c n_gold(c)·n_pred(c) — all exact integers
    val totals = cm.agg(
      sum(col("n")).cast(dec).as("nn"),
      coalesce(sum(when(col("gold") === col("pred"), col("n"))), lit(0L))
        .cast(dec).as("agree"))
    val crossTerm = classes
      .join(broadcast(goldMarg), Seq("cls"), "left")
      .join(broadcast(predMarg), Seq("cls"), "left")
      .agg(coalesce(sum(
          coalesce(col("n_gold"), lit(0L)).cast(dec) *
            coalesce(col("n_pred"), lit(0L)).cast(dec)),
        lit(0L).cast(dec)).as("rc"))
    val globals = totals.crossJoin(crossTerm).select(
      (col("agree").cast("double") / col("nn").cast("double"))
        .as("accuracy"),
      when(col("nn") * col("nn") - col("rc") =!= lit(0L).cast(dec),
          (col("agree") * col("nn") - col("rc")).cast("double") /
            (col("nn") * col("nn") - col("rc")).cast("double"))
        .otherwise(lit(0.0)).as("kappa"))

    classes
      .join(broadcast(diag), Seq("cls"), "left")
      .join(broadcast(goldMarg), Seq("cls"), "left")
      .join(broadcast(predMarg), Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("tp0"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp0"), lit(0L)))
          .as("fp"),
        (coalesce(col("n_gold"), lit(0L)) - coalesce(col("tp0"), lit(0L)))
          .as("fn"))
      .select(col("cls"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
            col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .otherwise(lit(0.0)).as("prec"),
        when(col("tp") + col("fn") > 0,
            col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
          .otherwise(lit(0.0)).as("rec"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
            (lit(2L) * col("tp")).cast("double") /
              (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
          .otherwise(lit(0.0)).as("f1"))
      .crossJoin(broadcast(globals))
      .orderBy("cls")
  }
}
