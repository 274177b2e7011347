package graft

import graft.ops.{AsOfJoin, Transforms}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of matches latest right row at or before left time") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:00"), "t0"), // exactly at quote time
      (1L, ts("2024-01-01 09:59:59"), "t-early"),
      (2L, ts("2024-01-01 10:00:10"), "t2"))
      .toDF("k", "t", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:03"), 101.0))
      .toDF("k", "qt", "px")
    val out = AsOfJoin.backward(trades, quotes, "k", "k", "t", "qt")
      .select("trade", "px").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out("t-early").isEmpty, "no quote yet")
    assert(out("t0").contains(100.0), "equal timestamp is inclusive")
    assert(out("t1").contains(101.0), "latest quote wins")
    assert(out("t2").isEmpty, "key 2 has no quotes")
  }

  test("rightTieBreak picks the last right row under the given ordering") {
    val l = Seq((1L, ts("2024-01-01 12:00:00"), "x")).toDF("k", "t", "l")
    val r = Seq(
      (1L, ts("2024-01-01 11:00:00"), 1L, "v1"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "v2"))
      .toDF("k", "rt", "ver", "v")
    val out = AsOfJoin.backward(l, r, "k", "k", "t", "rt",
      rightTieBreak = Seq("ver")).select("v").head().getString(0)
    assert(out == "v2")
  }

  test("overlapping non-key column names are rejected up front") {
    val l = Seq((1L, ts("2024-01-01 12:00:00"), "x")).toDF("k", "t", "v")
    val r = Seq((1L, ts("2024-01-01 11:00:00"), "y")).toDF("k", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, "k", "k", "t", "rt")
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("as-of join plan has one exchange on the key, no cross product") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", $"event_id", $"ts")
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val plan = AsOfJoin.backward(events, orders, "user_id", "o_custkey",
      "ts", "o_orderdate").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }
}

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def ts(s: String) = Timestamp.valueOf(s)

  test("session id increments on gaps over the threshold") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")), // same session (10 min)
      (1L, ts("2024-01-01 11:00:00")), // new session (50 min)
      (2L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "ts")
    val out = Transforms.sessionize(Seq("user_id"), col("ts"),
      gapMicros = 30L * 60 * 1000000)(df)
      .orderBy("user_id", "ts")
      .select("user_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L)))
  }
}

class FunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("funnel requires strictly-ordered stages and reports partial depth") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    // u1: full chain; u2: click BEFORE first view (doesn't count) and
    // no later click → depth 1; u3: view+click, purchase before click
    // (doesn't count) → depth 2; u4: no view at all → absent
    val rows = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(9)),
      (2L, "click", ts(0)), (2L, "view", ts(3)),
      (3L, "purchase", ts(1)), (3L, "view", ts(2)), (3L, "click", ts(4)),
      (4L, "purchase", ts(0)))
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    rows.toDF("user_id", "event_type", "ts")
      .withColumn("event_id", col("user_id"))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.TemporalQueries.funnelDepth(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r == Seq((1L, 3L), (2L, 1L), (3L, 2L)))
  }
}

class GapFillSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def ts(s: String) = Timestamp.valueOf(s)

  test("gapFill inserts zero rows for the missing buckets, endpoints inclusive") {
    // hours 10:00 and 13:00 present; 11:00 and 12:00 are gaps
    val counts = Seq((ts("2024-01-01 10:00:00"), 5L),
      (ts("2024-01-01 13:00:00"), 2L)).toDF("h", "n")
    val got = Transforms.gapFill(counts, "h", "1 HOUR", Map("n" -> 0L))
      .orderBy("h").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1)))
    assert(got.toSeq == Seq(
      ("2024-01-01 10:00:00.0", 5L), ("2024-01-01 11:00:00.0", 0L),
      ("2024-01-01 12:00:00.0", 0L), ("2024-01-01 13:00:00.0", 2L)))
    // an empty series has no spine — returned as-is, not an NPE
    assert(Transforms.gapFill(counts.where(lit(false)), "h", "1 HOUR",
      Map("n" -> 0L)).count() == 0)
  }

  test("locfDaily carries the day's LAST value forward per key, spans stay per-key") {
    // user 1: Jan 1 has two events (14:00 wins by ts), Jan 2-3 gap,
    // Jan 4 observed; user 2: a single day (no fill rows at all) —
    // its span must not borrow user 1's calendar
    val ev = Seq(
      (101L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      (102L, ts("2024-01-01 14:00:00"), 1L, 11.5),
      (103L, ts("2024-01-04 09:00:00"), 1L, 12.0),
      (104L, ts("2024-01-02 08:00:00"), 2L, 99.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val got = Transforms.locfDaily(ev, "user_id", "ts", "event_id", "value")
      .orderBy("user_id", "day").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2),
        r.getInt(3)))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01", 11.5, 0), (1L, "2024-01-02", 11.5, 1),
      (1L, "2024-01-03", 11.5, 1), (1L, "2024-01-04", 12.0, 0),
      (2L, "2024-01-02", 99.0, 0)))

    // equal-ts tie goes to the larger tiebreak id
    val tie = Seq(
      (7L, ts("2024-01-01 10:00:00"), 1L, 1.0),
      (8L, ts("2024-01-01 10:00:00"), 1L, 2.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val tgot = Transforms.locfDaily(tie, "user_id", "ts", "event_id", "value")
      .collect().map(r => r.getDouble(2))
    assert(tgot.toSeq == Seq(2.0))

    // no SinglePartition window: the LOCF window is keyed
    val plan = Transforms.locfDaily(ev, "user_id", "ts", "event_id", "value")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }
}

class AnomalySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("trailing z-score flags match a direct recomputation") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.TemporalQueries.valueAnomalies(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(5)))
    assert(got.nonEmpty, "sf0.001 must contain some 2-sigma outliers")
    val hist = Tables.load(spark, dir, "events")
      .select("user_id", "event_id", "value", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getTimestamp(3)))
      .groupBy(_._1)
      .map { case (u, rs) =>
        u -> rs.sortBy(r => (r._4.getTime, r._4.getNanos, r._2)).toVector
      }
    got.take(10).foreach { case (u, e, v, nPrev, z) =>
      val series = hist(u)
      val idx = series.indexWhere(_._2 == e)
      val prev = series.slice(math.max(0, idx - 20), idx).map(_._3)
      assert(prev.length == nPrev && nPrev >= 10)
      // recompute with exact decimal sums like the engine
      val s1 = prev.map(BigDecimal(_)).sum.toDouble
      val s2 = prev.map(x => BigDecimal(x) * BigDecimal(x)).sum.toDouble
      val n = prev.length.toDouble
      val mean = s1 / n
      val want = (v - mean) / math.sqrt(s2 / n - mean * mean)
      assert(math.abs(want - z) < 1e-9, s"user=$u event=$e: $want vs $z")
      assert(math.abs(z) > 2.0)
    }
  }
}

class CohortSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cohort retention: first-day cohorts, distinct actives per offset") {
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-0$d%d 10:00:00")
    // u1 first on d1 (active d1,d1,d3), u2 only d1, u3 first d3 (d3,d4)
    val ev = Seq((1L, t(1)), (1L, t(1)), (1L, t(3)), (2L, t(1)),
      (3L, t(3)), (3L, t(4))).toDF("user_id", "ts")
    val got = graft.ops.Transforms.cohortRetention(ev)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      ("2024-01-01", 0, 2L), // u1+u2 on their cohort day
      ("2024-01-01", 2, 1L), // u1 returns two days later
      ("2024-01-03", 0, 1L), // u3 cohort day
      ("2024-01-03", 1, 1L)))
  }
}
