package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-node triangle counting on a top-k strongest-co-occurrence
  * graph — the graph-family complement to [[PageRank]]: triangles
  * measure neighborhood cohesion (clustering), the standard signal
  * for community curation and link-spam triage over a co-occurrence
  * corpus. Not a reference operator: analytics extension family.
  *
  * Two composable stages:
  *
  *  1. [[cooccurrenceKnnGraph]] builds the graph: items co-occurring
  *     in a group (parts in an order, tokens in a doc) become
  *     candidate edges weighted by co-occurrence support, and each
  *     node keeps only its `k` STRONGEST neighbors (support desc,
  *     neighbor asc ties). The k-NN union graph has ≤ k·n directed
  *     picks — edge count is LINEAR in nodes by construction, which
  *     is what makes global triangle enumeration tractable at all:
  *     the raw support graph's edge count grows with corpus density.
  *  2. [[triangleCounts]] enumerates triangles degree-ordered
  *     (Suri–Vassilvitskii): each edge is oriented from its
  *     (degree, id)-smaller endpoint, wedges are generated only at
  *     that smaller endpoint, and a wedge closes iff its far pair is
  *     an edge. Hub nodes therefore never fan out — a node of degree
  *     d generates wedges only where it is the cold side, bounding
  *     the wedge frame by Σ min-degree² instead of Σ d².
  *
  * Every count is an exact integer over deterministic tie orders, so
  * the whole pipeline is bit-reproducible and SQL-replayable.
  *
  * Scale shape (100 TB): co-occurrence pairs are bounded per group
  * by group width (order width ≤ 7 in TPC-H; chunked docs bound it
  * for text); one shuffle builds supports, one per-node
  * WindowGroupLimit top-k keeps the picks, and the wedge self-join
  * runs on the linear-sized oriented edge frame. No stage touches a
  * frame larger than the pair-instance list.
  */
object Triangles {

  /** Undirected simple edges (x < y) of the top-`k`
    * strongest-neighbor co-occurrence graph over (`groupCol`,
    * `itemCol`) memberships.
    */
  def cooccurrenceKnnGraph(memberships: DataFrame, groupCol: String,
      itemCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val op = memberships
      .select(col(groupCol).as("o"), col(itemCol).as("p")).distinct()
    val cooc = op.join(op.withColumnRenamed("p", "p2"), "o")
      .filter(col("p") < col("p2"))
      .groupBy(col("p").as("x"), col("p2").as("y"))
      .agg(count(lit(1)).as("support"))
    val du = cooc.select(col("x").as("node"), col("y").as("nbr"), col("support"))
      .union(cooc.select(col("y"), col("x"), col("support")))
    // rank ≤ k plans as WindowGroupLimit: per-partition partial top-k,
    // never a full per-node sort of the support lists
    val rk = row_number().over(
      Window.partitionBy("node").orderBy(col("support").desc, col("nbr")))
    du.withColumn("rk", rk).filter(col("rk") <= k)
      .select(least(col("node"), col("nbr")).as("x"),
        greatest(col("node"), col("nbr")).as("y"))
      .distinct()
  }

  /** (node, degree, triangles) for every node of the undirected
    * simple edge list `edges` (columns x < y) — triangles counted
    * once per corner via degree-ordered wedge generation.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("x").as("node"))
      .union(edges.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val withDeg = edges
      .join(deg.withColumnRenamed("node", "x").withColumnRenamed("d", "dx"), "x")
      .join(deg.withColumnRenamed("node", "y").withColumnRenamed("d", "dy"), "y")
    // orient from the (degree, id)-smaller endpoint — struct ordering
    // is lexicographic, the exact (d, node) tuple order of the SQL
    val xFirst = struct(col("dx"), col("x")) < struct(col("dy"), col("y"))
    val o = withDeg.select(
      when(xFirst, col("x")).otherwise(col("y")).as("src"),
      when(xFirst, col("y")).otherwise(col("x")).as("dst"))
    val wedges = o.join(o.withColumnRenamed("dst", "dst2"), "src")
      .filter(col("dst") < col("dst2"))
    val tri = wedges.join(edges,
        col("dst") === col("x") && col("dst2") === col("y"))
      .select(col("src").as("u"), col("dst").as("v1"), col("dst2").as("v2"))
    val corners = tri.select(col("u").as("node"))
      .union(tri.select(col("v1")))
      .union(tri.select(col("v2")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(corners, Seq("node"), "left")
      .select(col("node"), col("d").as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }
}
