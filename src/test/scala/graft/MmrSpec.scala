package graft

import graft.vector.Mmr
import org.scalatest.funsuite.AnyFunSuite

class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Plain-Scala greedy MMR on the quantized grid. */
  private def reference(vs: Map[Long, Array[Long]], k: Int): List[(Long, Long)] = {
    val n = vs.size
    val dim = vs.values.head.length
    // BigInt division truncates toward zero — the engine's `div`
    val cent = Array.tabulate(dim) { i =>
      (vs.values.map(v => BigInt(v(i))).sum / n).toLong
    }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val rel = vs.map { case (id, v) => id -> dot(v, cent) }
    var picked = List.empty[(Long, Long)]
    for (_ <- 1 to k) {
      val chosen = vs.keys.filterNot(id => picked.exists(_._1 == id))
        .map { id =>
          val s =
            if (picked.isEmpty) 2 * rel(id)
            else 2 * rel(id) - picked.map(p => dot(vs(id), vs(p._1))).max
          (id, s)
        }.minBy { case (id, s) => (-s, id) }
      picked :+= chosen
    }
    picked
  }

  test("mmr selection matches a plain-Scala greedy replay") {
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 60L).map(id =>
      (id, Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = corpus.toDF("vec_id", "embedding")
    val vs = corpus.map { case (id, emb) =>
      id -> emb.map(x => math.round(x.toDouble * 1e6)).toArray
    }.toMap
    val want = reference(vs, k = 5).zipWithIndex
      .map { case ((id, s), i) => (i + 1, id, s) }
    val got = Mmr.mmrSelect(df, k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
    assert(got == want)
    assert(got.map(_._2).distinct.size == 5, "picks must be distinct")
  }

  test("mmr spreads picks across clusters where pure relevance would not") {
    // two tight clusters along +x and -x plus one along +y: top-3 by
    // relevance alone would all come from one cluster; MMR must not
    def mk(id: Long, x: Double, y: Double) =
      (id, Seq(x.toFloat, y.toFloat))
    val df = (Seq(mk(1, 1.0, 0.01), mk(2, 0.99, 0.0), mk(3, 0.98, 0.02)) ++
      Seq(mk(11, -1.0, 0.01), mk(12, -0.99, 0.0)) ++
      Seq(mk(21, 0.0, 1.0), mk(22, 0.01, 0.99))).toDF("vec_id", "embedding")
    val picks = Mmr.mmrSelect(df, k = 3).collect().map(_.getLong(1)).toSet
    val clusters = Set(
      picks.intersect(Set(1L, 2L, 3L)).nonEmpty,
      picks.intersect(Set(11L, 12L)).nonEmpty,
      picks.intersect(Set(21L, 22L)).nonEmpty)
    assert(!clusters.contains(false),
      s"picks $picks must cover all three clusters")
  }
}
