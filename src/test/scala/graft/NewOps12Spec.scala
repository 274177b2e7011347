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
}
