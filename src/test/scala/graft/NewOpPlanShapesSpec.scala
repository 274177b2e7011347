package graft

import graft.ops.{ConnectedComponents, QuantileNorm}
import graft.text.Collocations
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-6 operators: the scale contracts each one
  * advertises must be visible in the plan, not just in the Scaladoc.
  */
class NewOpPlanShapesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def exchanges(p: org.apache.spark.sql.execution.SparkPlan)
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
    here ++ p.children.flatMap(exchanges) ++
      p.subqueries.flatMap(exchanges)
  }

  test("pmi bigrams plan: driver top-k and vocab broadcasts, no global sort") {
    val docs = Seq("a b a b c", "b c b c d", "a c a c a").toDF("text")
    val df = Collocations.pmiBigrams(docs, minCount = 1L, topK = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "top-K must plan as TakeOrderedAndProject, not a global sort+limit")
    assert(df.queryExecution.optimizedPlan.toString.contains("broadcast"),
      "unigram counts must broadcast onto the bigram frame")
  }

  test("star round plans: equi-joins only, no cartesian product") {
    val e = Seq((5L, 2L), (9L, 5L), (7L, 3L)).toDF("u", "v")
    for (plan <- Seq(
        ConnectedComponents.largeStar(e).queryExecution.executedPlan,
        ConnectedComponents.smallStar(e).queryExecution.executedPlan)) {
      val s = plan.toString
      assert(!s.contains("Cartesian") && !s.contains("NestedLoop"),
        s"star rounds must stay equi-join shaped:\n$s")
    }
  }

  test("quantile normalization: no single-partition exchange anywhere") {
    val df = (1L to 200L).map(i => (i, s"g${i % 3}", i * 7 % 101))
      .toDF("doc_id", "source", "n_chars")
    val out = QuantileNorm.quantileNormalize(df,
      col("doc_id"), col("source"), col("n_chars"))
    out.write.format("noop").mode("overwrite").save()
    val singles = exchanges(out.queryExecution.executedPlan)
      .filter(_.outputPartitioning.numPartitions == 1)
    assert(singles.isEmpty,
      s"global ranking must ride the two-phase prefix sum, got: $singles")
  }
}
