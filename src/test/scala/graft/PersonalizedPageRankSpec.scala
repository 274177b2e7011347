package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PersonalizedPageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Plain-Scala replay of the integer PPR recurrence. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
      seed: Long => Boolean): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val out = edges.distinct.groupBy(_._1).view.mapValues(_.size).toMap
    var rank = nodes.map(n => n -> (if (seed(n)) 1000000L else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = edges.distinct
        .map { case (s, d) => d -> rank(s) * 85 / (100L * out(s)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rank = nodes.map(n =>
        n -> ((if (seed(n)) 150000L else 0L) + in.getOrElse(n, 0L))).toMap
    }
    rank
  }

  test("personalized ranks match a plain replay; off-seed islands stay 0") {
    // component A (1-2-3 triangle, seeded at 1), component B (10-11,
    // unseeded — must end at exactly 0)
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (3L, 1L), (10L, 11L), (11L, 10L))
    val df = edges.toDF("src", "dst")
    val got = PageRank.personalizedPageRank(df, iters = 4, seed = _ === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == reference(edges, 4, _ == 1L))
    assert(got(10L) == 0L && got(11L) == 0L)
    assert(got(1L) > got(2L) && got(1L) > got(3L),
      "the seed must dominate its component")
  }

  test("all-nodes seed set degenerates to standard integer PageRank") {
    val rnd = new scala.util.Random(3)
    val edges = (1 to 60).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }
    val df = edges.toDF("src", "dst")
    val std = PageRank.integerPageRank(df, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ppr = PageRank.personalizedPageRank(df, 3, seed = _ => lit(true))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(std == ppr)
  }
}
