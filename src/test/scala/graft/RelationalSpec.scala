package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    // keep catalog artifacts (warehouse, derby metastore) out of the repo
    System.setProperty("derby.system.home", "/tmp/graft_derby")
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // testdata timestamps are naive timestamp[us]; read them as
      // session-zone TIMESTAMP (the pre-regeneration type), not NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class RelationalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("every declared query runs and yields rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle and every oracle has a query") {
    assert((SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).isEmpty,
      "queries missing an oracle")
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty,
      "orphan oracles")
  }

  test("native expressions are callable from SQL after registration") {
    graft.app.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_polyhash('abc def') AS h,
        |  graft_shingles('a b c d', 3) AS sh,
        |  graft_quantdot(array(1L, 2L), array(3L, 4L)) AS d,
        |  graft_simhash64(array(-1L)) AS s""".stripMargin).head()
    assert(r.getLong(0) == 985994463L)
    assert(r.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(r.getLong(2) == 11L)
    assert(r.getLong(3) == -1L)
    // the SparkSessionExtensions route wires the same builders
    assert(new graft.app.GraftExtensions()
      .isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }

  test("curation battery is callable from SQL: canonical_url and gopher round-trip") {
    import spark.implicits._
    graft.app.GraftExtensions.register(spark)
    val urls = Seq("HTTP://Ex.COM:80/Path?b=2&a=1#frag",
      "https://www.site.org:443/x/", "http://plain.net/ok")
    urls.toDF("url").createOrReplaceTempView("cu_in")
    val viaSql = spark.sql(
      "SELECT graft_canonical_url(url) AS c FROM cu_in ORDER BY url")
      .collect().map(_.getString(0)).toSeq
    val viaCol = urls.toDF("url")
      .select(graft.text.WebAnalysis.canonicalizeUrl(col("url")).as("c"),
        col("url"))
      .orderBy("url").collect().map(_.getString(0)).toSeq
    assert(viaSql == viaCol, "SQL face must equal the Column face")
    val docs = Seq((1L, ("the be to of and that have with " * 8).trim),
      (2L, "x y z")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("gq_in")
    val sqlPass = spark.sql(
      """SELECT doc_id, graft_gopher(text).pass AS p,
        |  graft_gopher(text, 1, 10).pass AS p2 FROM gq_in ORDER BY doc_id"""
        .stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val dfPass = graft.text.TextAnalysis.gopherQuality(docs)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("pass")).toMap
    assert(sqlPass.map(x => x._1 -> x._2).toMap == dfPass)
    // the (text, minWords, maxWords) form re-bounds the word-count rule
    assert(sqlPass.find(_._1 == 1L).get._3 == 0, "64 words > maxWords 10")
  }

  test("weighted-mean UDAF: hand value, SQL registration, partial-agg plan") {
    import spark.implicits._
    graft.app.GraftExtensions.register(spark)
    // (10·1 + 20·3) / 4 = 17.5
    Seq((1, 10.0, 1.0), (1, 20.0, 3.0)).toDF("g", "v", "w")
      .createOrReplaceTempView("wm_in")
    val r = spark.sql(
      """SELECT graft_weighted_mean(CAST(v AS DECIMAL(12,2)),
        |  CAST(w AS DECIMAL(12,2))) AS m FROM wm_in GROUP BY g""".stripMargin)
      .head().getDouble(0)
    assert(r == 17.5)
    // empty group never occurs, but a zero-weight group is NaN not a crash
    val wm = udaf(graft.functions.WeightedMean)
    val z = Seq((1, 5.0, 0.0)).toDF("g", "v", "w")
      .select(wm(col("v").cast("decimal(12,2)"),
        col("w").cast("decimal(12,2)")).as("m"))
      .head().getDouble(0)
    assert(z.isNaN)
    // the Aggregator plans as a two-phase aggregate (map-side combine)
    val plan = graft.queries.Relational.weightedAvgPrice(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_weightedmean"),
      s"expected a map-side partial aggregation phase in:\n$plan")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q08 replacing-final yields exactly one row per key") {
    val df = SparkEntry.queries("q08_replacing_final")(spark, dir)
    val total = df.count()
    val keys = df.select("user_id").distinct().count()
    assert(total == keys)
  }

  test("q12 topk is sorted descending by totalprice") {
    val rows = SparkEntry.queries("q12_topk")(spark, dir)
      .select("o_totalprice").collect().map(_.getDouble(0))
    assert(rows.sameElements(rows.sorted(Ordering[Double].reverse)))
    assert(rows.length == 10)
  }

  test("q04 plan broadcasts the dimension side") {
    val plan = SparkEntry.queries("q04_broadcast_dim_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join in plan")
  }

  test("q19 scan reads only the needed document columns") {
    val plan = SparkEntry.queries("q19_token_count")(spark, dir)
      .queryExecution.executedPlan.toString
    val scanLine = plan.split("\n").find(_.contains("FileScan")).get
    assert(scanLine.contains("doc_id") && scanLine.contains("text"))
    assert(!scanLine.contains("lang") && !scanLine.contains("source"),
      s"column pruning failed: $scanLine")
  }

  test("q09 pushes the event_type filters into the scans") {
    val plan = SparkEntry.queries("q09_union_routing")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]")
      || plan.contains("EqualTo(event_type,click)"), "click filter not pushed")
  }

  test("q02 pushes filters into the parquet scan") {
    val plan = SparkEntry.queries("q02_filter_project")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(plan.contains("l_returnflag"), "returnflag filter not pushed")
  }
}

class TransformsSpec extends AnyFunSuite {
  import graft.ops.Transforms
  lazy val spark = SparkTestSession.spark

  def df = {
    import spark.implicits._
    Seq(("a", "", 1), ("b", "x", 2), ("a", "y", 3))
      .toDF("k", "s", "v")
  }

  test("skipColumns drops columns") {
    assert(Transforms.skipColumns(Seq("s"))(df).columns.toSeq == Seq("k", "v"))
  }

  test("emptyToNull maps '' to null on string cols only") {
    val out = Transforms.emptyToNull()(df).collect()
    assert(out.count(_.isNullAt(1)) == 1)
  }

  test("fillDefaults replaces nulls") {
    val withNull = Transforms.emptyToNull()(df)
    val filled = Transforms.fillDefaults(Map("s" -> "DEFAULT"))(withNull)
    assert(filled.filter(col("s") === "DEFAULT").count() == 1)
  }

  test("replacingFinal keeps highest-version row per key") {
    val out = Transforms.replacingFinal(Seq("k"), Seq(col("v")))(df)
      .orderBy("k").collect()
    assert(out.length == 2)
    assert(out(0).getInt(2) == 3) // key a, max v
    assert(out(1).getInt(2) == 2) // key b
  }

  test("sortedColumns orders lexicographically") {
    assert(Transforms.sortedColumns(df).columns.toSeq == Seq("k", "s", "v"))
  }

  test("stringifyForSink casts non-strings and hexes binary") {
    import spark.implicits._
    val b = Seq((Array[Byte](0x0a, 0x0b), BigDecimal(1.5), Seq(1, 2)))
      .toDF("bin", "dec", "arr")
    val out = Transforms.stringifyForSink(b).collect()(0)
    assert(out.getString(0) == "0a0b")
    assert(out.getString(1).startsWith("1.5"))
    assert(out.getString(2) == "[1,2]")
  }
}

/** q54-q58: grouping sets / generator / semi-join / scalar+array
  * function families.
  */
class FunctionSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.queries.Relational
  val dir = "/root/testdata/sf0.001"

  test("grouping sets output is exactly the union of its member groupings") {
    val gs = Relational.groupingSetsSummary(spark, dir)
    val o = Tables.load(spark, dir, "orders")
    val nPairs = o.select("o_orderpriority", "o_orderstatus").distinct().count()
    val nStatus = o.select("o_orderstatus").distinct().count()
    // gid bitmask: 0 = both keys live, 2 = priority aggregated away,
    // 3 = grand total (SQL-standard GROUPING() convention)
    assert(gs.filter(col("gid") === 0).count() == nPairs)
    assert(gs.filter(col("gid") === 2).count() == nStatus)
    assert(gs.filter(col("gid") === 3).count() == 1)
    assert(gs.count() == nPairs + nStatus + 1)
    assert(gs.filter(col("gid") === 3).head().getAs[Long]("n_orders")
      == o.count())
  }

  test("grouping sets plans one Expand pass, not one scan per set") {
    val plan = Relational.groupingSetsSummary(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert("(?s)Scan parquet".r.findAllIn(plan).size == 1,
      "each grouping set must NOT re-scan the table")
  }

  test("semi join emits each matching customer once, same as IN-subquery") {
    val r = Relational.customersWithUrgentOrders(spark, dir)
    assert(r.count() == r.select("c_custkey").distinct().count())
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 350000.0)
    val expected = Tables.load(spark, dir, "customer")
      .join(o, col("c_custkey") === col("o_custkey"))
      .select("c_custkey").distinct().count()
    assert(r.count() == expected)
  }

  test("token frequency counts match a hand-computed corpus") {
    import spark.implicits._
    val docs = Seq("a b a", "b  c", "a").toDF("text")
    val r = docs.select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").count()
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    // the double space in "b  c" must not yield an empty token
    assert(r == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("scalar showcase: ISO day-of-week and split-index semantics") {
    val r = Relational.scalarFunctionShowcase(spark, dir)
    assert(r.filter(col("iso_dow") < 1 || col("iso_dow") > 7).count() == 0)
    assert(r.filter(!col("pr_word").isin(
      "URGENT", "HIGH", "MEDIUM", "NOT SPECIFIED", "LOW")).count() == 0)
    assert(r.filter(col("key_mod7") < 0 || col("key_mod7") > 6).count() == 0)
  }

  test("RANGE frame shares one frame across tied order keys (unlike ROWS)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // two events at the same instant: RANGE gives both the full peer
    // frame (n=2 for each); a ROWS frame would give 1 then 2
    val df = Seq((1L, 1000000L), (1L, 1000000L), (1L, 5000000000L))
      .toDF("user_id", "us")
    val range = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-1800000000L, Window.currentRow)
    val r = df.select(col("us"), count(lit(1)).over(range).as("n"))
      .orderBy("us").collect().map(_.getLong(1))
    assert(r.toSeq == Seq(2L, 2L, 1L),
      "peers must share a frame; far row must fall outside the range")
  }

  test("map function family: build from entries, lookup, keys") {
    import spark.implicits._
    val df = Seq((1L, "click", 2L), (1L, "view", 5L), (2L, "click", 1L))
      .toDF("user_id", "t", "n")
    val m = df.groupBy("user_id")
      .agg(map_from_entries(array_sort(collect_list(struct(col("t"), col("n")))))
        .as("counts"))
    val rows = m.orderBy("user_id").collect()
    assert(rows(0).getMap[String, Long](1).toMap
      == Map("click" -> 2L, "view" -> 5L))
    val looked = m
      .select(col("user_id"),
        element_at(col("counts"), "view").as("views"),
        size(map_keys(col("counts"))).as("n_types"))
      .orderBy("user_id").collect()
    assert(looked(0).getLong(1) == 5L && looked(0).getInt(2) == 2)
    assert(looked(1).isNullAt(1) && looked(1).getInt(2) == 1)
  }

  test("array showcase invariants: distinct <= total, min <= max") {
    val r = Relational.arrayFunctionShowcase(spark, dir)
    assert(r.count() ==
      Tables.load(spark, dir, "documents").count())
    assert(r.filter(col("n_distinct") > col("n_toks")).count() == 0)
    assert(r.filter(col("tok_min") > col("tok_max")).count() == 0)
  }
}
