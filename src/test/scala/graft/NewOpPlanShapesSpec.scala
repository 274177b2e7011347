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

  test("vocab/LM top-V selection: TakeOrderedAndProject, never an unpartitioned window") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.window.WindowExec
    val docs = Seq((1L, "a b a c c"), (2L, "b c d d d"), (3L, "a a b e"))
      .toDF("doc_id", "text")
    val top = graft.text.Vocab.topTokenCounts(docs, 3, "text")
    top.collect()
    val vp = nodes(top.queryExecution.executedPlan)
    assert(vp.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      "top-v must plan as a distributed TakeOrderedAndProject")
    assert(vp.collect { case w: WindowExec => w }.isEmpty,
      "the corpus-distinct-token frame must never see a window")
    // the built vocab is a broadcast-ready local relation: no window
    // (and no recompute of the corpus scan) anywhere in its plan
    val vocab = graft.text.Vocab.buildVocab(docs, v = 3)
    assert(nodes(vocab.queryExecution.executedPlan)
        .collect { case w: WindowExec => w }.isEmpty)
    val lm = graft.text.LanguageModel.stupidBackoffPerplexity(docs, vb = 4)
    lm.collect()
    val lp = nodes(lm.queryExecution.executedPlan)
    assert(lp.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      "bigram pruning must plan as a distributed TakeOrderedAndProject")
    assert(lp.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }.isEmpty,
      "the distinct-bigram frame must never hit WindowExec's " +
        "no-partition-defined path")
  }

  test("encodeDocuments: vocab broadcast, data shuffles keyed on doc_id only") {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, ""))
      .toDF("doc_id", "text")
    val vocab = Seq(("a", 1L, 1), ("b", 1L, 2)).toDF("token", "cnt", "id")
    val out = graft.text.Vocab.encodeDocuments(docs, vocab)
    out.write.format("noop").mode("overwrite").save()
    assert(out.queryExecution.optimizedPlan.toString.contains("broadcast"),
      "the vocab must broadcast onto the exploded token frame")
    val ex = exchanges(out.queryExecution.executedPlan)
    assert(ex.nonEmpty, "expected the one doc_id re-assembly shuffle")
    val offKey = ex.filterNot(_.outputPartitioning match {
      case h: HashPartitioning =>
        h.expressions.flatMap(_.references.toSeq).map(_.name).toSet == Set("doc_id")
      case _ => false
    })
    assert(offKey.isEmpty,
      s"beyond-doc_id shuffle crept in: ${offKey.map(_.outputPartitioning)}")
  }

  test("quantile normalization: no single-partition exchange anywhere") {
    val df = (1L to 200L).map(i => (i, s"g${i % 3}", i * 7 % 101))
      .toDF("doc_id", "source", "n_chars")
    val out = QuantileNorm.quantileNormalize(df,
      col("doc_id"), col("source"), col("n_chars"))
    out.write.format("noop").mode("overwrite").save()
    val singles = exchanges(out.queryExecution.executedPlan)
      .filter(_.outputPartitioning.numPartitions == 1)
      // the N = max(grank) scalar aggregate legitimately funnels ONE
      // partial-agg row per partition into a single partition; any
      // other single-partition exchange is a data-sized funnel
      .filterNot(_.child.isInstanceOf[
        org.apache.spark.sql.execution.aggregate.BaseAggregateExec])
    assert(singles.isEmpty,
      s"global ranking must ride the two-phase prefix sum, got: $singles")
  }
}
