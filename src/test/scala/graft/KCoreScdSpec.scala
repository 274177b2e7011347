package graft

import graft.ops.{KCore, QuantileNorm, Scd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KCoreScdSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("k-core peels a chain off a clique and is partition-stable") {
    // K5 clique on 1..5 plus a tail 5-6-7-8: the 3-core is exactly
    // the clique (the tail peels off over several cascading rounds)
    val clique = for { i <- 1L to 5L; j <- (i + 1) to 5L } yield (i, j)
    val tail = Seq((5L, 6L), (6L, 7L), (7L, 8L))
    val edges = (clique ++ tail).toDF("a", "b")
    def run(df: org.apache.spark.sql.DataFrame) =
      KCore.kCore(df, k = 3).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run(edges.repartition(5))
    assert(got == (1L to 5L).map(_ -> 4L).toMap)
    assert(got == run(edges.repartition(1)))
    // k above the max degree: empty core, no convergence failure
    assert(KCore.kCore(edges, k = 10).count() == 0)
  }

  test("scd2 intervals collapse runs and close at the next change") {
    val rows = Seq(
      (1L, 10L, "a"), (1L, 11L, "a"), (1L, 12L, "b"),
      (1L, 13L, "b"), (1L, 14L, "a"),
      (2L, 20L, "x")
    ).map { case (u, t, v) =>
      (u, new java.sql.Timestamp(t * 1000), v, t)
    }.toDF("user_id", "ts", "event_type", "event_id")
    val got = Scd.scd2Intervals(rows, col("user_id"), col("event_type"),
        col("ts"), col("event_id"))
      .orderBy("key", "version")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime / 1000,
        Option(r.getTimestamp(4)).map(_.getTime / 1000), r.getLong(5)))
      .toList
    assert(got == List(
      (1L, 1L, "a", 10L, Some(12L), 2L),
      (1L, 2L, "b", 12L, Some(14L), 2L),
      (1L, 3L, "a", 14L, None, 1L),
      (2L, 1L, "x", 20L, None, 1L)))
  }

  test("scd2 version totally orders equal-timestamp changes") {
    // three changes at ONE timestamp: valid_from ties across runs, so
    // only (key, version) orders the history; the event_id tie-break
    // pins run order a→b→a
    val rows = Seq((1L, "a", 1L), (1L, "b", 2L), (1L, "a", 3L))
      .map { case (u, v, id) =>
        (u, new java.sql.Timestamp(10L * 1000), v, id)
      }.toDF("user_id", "ts", "event_type", "event_id")
    val got = Scd.scd2Intervals(rows, col("user_id"), col("event_type"),
        col("ts"), col("event_id"))
      .orderBy("key", "version")
      .collect().map(r => (r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime / 1000,
        Option(r.getTimestamp(4)).map(_.getTime / 1000))).toList
    assert(got == List(
      (1L, "a", 10L, Some(10L)),
      (2L, "b", 10L, Some(10L)),
      (3L, "a", 10L, None)))
  }

  test("scd2 treats NULL as a value: null runs collapse, transitions close") {
    // a→NULL→NULL→a: three intervals, the null run carrying value null
    val rows = Seq(
      (1L, 10L, Some("a")), (1L, 11L, None), (1L, 12L, None),
      (1L, 13L, Some("a")),
      // key whose FIRST value is null — the row-number guard, not
      // `lag IS NULL`, must open this run
      (2L, 20L, None), (2L, 21L, Some("x"))
    ).map { case (u, t, v) =>
      (u, new java.sql.Timestamp(t * 1000), v.orNull, t)
    }.toDF("user_id", "ts", "event_type", "event_id")
    val got = Scd.scd2Intervals(rows, col("user_id"), col("event_type"),
        col("ts"), col("event_id"))
      .orderBy("key", "version")
      .collect().map(r => (r.getLong(0), Option(r.getString(2)),
        r.getTimestamp(3).getTime / 1000, r.getLong(5))).toList
    assert(got == List(
      (1L, Some("a"), 10L, 1L),
      (1L, None, 11L, 2L),
      (1L, Some("a"), 13L, 1L),
      (2L, None, 20L, 1L),
      (2L, Some("x"), 21L, 1L)))
  }

  test("quantile normalization maps group ranks onto global values") {
    // group g1 values 1..4, group g2 values 101..104: same in-group
    // quantiles must map both onto the SAME global picks
    val df = Seq(
      (1L, "g1", 1L), (2L, "g1", 2L), (3L, "g1", 3L), (4L, "g1", 4L),
      (5L, "g2", 101L), (6L, "g2", 102L), (7L, "g2", 103L), (8L, "g2", 104L)
    ).toDF("doc_id", "source", "n_chars")
    val got = QuantileNorm.quantileNormalize(df,
        col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // N=8: q_ppm = r*1e6/5, pick = q_ppm*9/1e6 → ranks 1..4 → picks
    // 1,3,5,7 → globals 1,3,101,103 for both groups
    assert(got == Map(
      1L -> 1L, 2L -> 3L, 3L -> 101L, 4L -> 103L,
      5L -> 1L, 6L -> 3L, 7L -> 101L, 8L -> 103L))
  }
}
