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

  test("candidate prefilter: N >= corpus is bit-identical to exact; N < corpus stays in-pool") {
    val rnd = new scala.util.Random(23)
    val corpus = (0L until 40L).map(id =>
      (id, Seq.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = corpus.toDF("vec_id", "embedding")
    val exact = Mmr.mmrSelect(df, k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
    val pooled = Mmr.mmrSelect(df, k = 4, candidateN = 40)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toList
    assert(pooled == exact,
      "N >= corpus must reduce the prefilter to the exact path")
    // N < corpus: documented contract — every pick from the top-N
    // relevance pool, still k distinct picks in rank order
    val vs = corpus.map { case (id, emb) =>
      id -> emb.map(x => math.round(x.toDouble * 1e6)).toArray
    }.toMap
    val cent = Array.tabulate(6) { i =>
      (vs.values.map(v => BigInt(v(i))).sum / vs.size).toLong
    }
    val pool = vs.map { case (id, v) =>
      id -> v.zip(cent).map { case (x, y) => x * y }.sum
    }.toList.sortBy { case (id, r) => (-r, id) }.take(8).map(_._1).toSet
    val small = Mmr.mmrSelect(df, k = 4, candidateN = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toList
    assert(small.map(_._1) == List(1, 2, 3, 4))
    assert(small.map(_._2).distinct.size == 4 &&
      small.map(_._2).toSet.subsetOf(pool),
      s"picks ${small.map(_._2)} must come from the top-8 relevance pool $pool")
  }

  test("mmr guards: empty corpus and k past the pool fail loudly") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val e1 = intercept[IllegalArgumentException] { Mmr.mmrSelect(empty, k = 1) }
    assert(e1.getMessage.contains("empty corpus"))
    val three = (1L to 3L).map(id => (id, Seq(0.1f, 0.2f)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] { Mmr.mmrSelect(three, k = 5) }
    assert(e2.getMessage.contains("exceeds the corpus"))
    val e3 = intercept[IllegalArgumentException] {
      Mmr.mmrSelect(three, k = 5, candidateN = 3)
    }
    assert(e3.getMessage.contains("candidateN must be"))
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
