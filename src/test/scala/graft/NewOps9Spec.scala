package graft

import graft.dedup.Dedup
import graft.sources.XmlSource
import graft.vector.VectorSearch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-9 additions: the XML source/sink,
  * embedding-space contamination, label-relevance retrieval
  * evaluation, and the corpus n-gram novelty curve.
  */
class NewOps9Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("XmlSource round-trips every column type including NULLs") {
    val src = Seq(
      (1L, Some(2.5d), Some("a<b&c"), Some(java.sql.Timestamp.valueOf("2024-03-01 10:20:30.123456"))),
      (2L, None, None, None),
      (3L, Some(0.1d + 0.2d), Some("line\nbreak"), Some(java.sql.Timestamp.valueOf("1999-12-31 23:59:59.0")))
    ).toDF("id", "v", "s", "ts")
    val path = tmp("graft_xml_spec")
    XmlSource.write(src, path)
    val sorted = StructType(src.schema.fields.sortBy(_.name))
    val back = XmlSource.read(spark, path, Some(sorted))
      .select(src.columns.map(col).toIndexedSeq: _*)
    // doubles survive (shortest-repr toString), markup is escaped,
    // absent elements come back as NULL
    assert(back.orderBy("id").collect().toSeq ==
      src.orderBy("id").collect().toSeq)
  }

  test("XmlSource preserves leading/trailing whitespace in strings") {
    // locks the ignoreSurroundingSpaces=false pin: XML readers trim
    // surrounding whitespace by default, which would silently alter
    // padded string values (the documented round-trip hazard)
    val src = Seq(
      (1L, "  leading"), (2L, "trailing  "), (3L, "  both  "),
      (4L, " "), (5L, "inner  gap")
    ).toDF("id", "s")
    val path = tmp("graft_xml_ws")
    XmlSource.write(src, path)
    val back = XmlSource.read(spark, path,
        Some(StructType(src.schema.fields.sortBy(_.name))))
      .select("id", "s")
    assert(back.orderBy("id").collect().toSeq ==
      src.orderBy("id").collect().toSeq)
  }

  test("XmlSource round-trips orders at sf0.001 value-identically") {
    val dir = "/root/testdata/sf0.001"
    val src = Tables.load(spark, dir, "orders")
    val path = tmp("graft_xml_orders")
    XmlSource.write(src, path)
    val sorted = StructType(src.schema.fields.sortBy(_.name))
    val back = XmlSource.read(spark, path, Some(sorted))
      .select(src.columns.map(col).toIndexedSeq: _*)
    assert(back.orderBy("o_orderkey").collect().toSeq ==
      src.orderBy("o_orderkey").collect().toSeq)
  }

  test("embeddingContamination: planted probe twin is flagged at cos 1.0") {
    val rnd = new scala.util.Random(7)
    val base = (0L until 30L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    // corpus vec 5 duplicated as probe 1000; everything else random
    val corpus = base.toDF("vec_id", "embedding")
    val probes = Seq((1000L, base(5)._2)).toDF("vec_id", "embedding")
    val r = VectorSearch.embeddingContamination(corpus, probes,
      threshold = 0.999)
    val rows = r.collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 5L &&
      rows(0).getLong(1) == 1L && rows(0).getDouble(2) == 1.0, rows.toSeq)
    // the probe frame broadcasts; the corpus is never shuffled into
    // a cartesian
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("embeddingContamination threshold is a hard boundary") {
    // colinear vectors with known cosines: probe (1,0); corpus at
    // cos 1.0, ~0.707, 0.0
    val corpus = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(1f, 1f)), (3L, Seq(0f, 1f))
    ).toDF("vec_id", "embedding")
    val probes = Seq((9L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val hits = VectorSearch.embeddingContamination(corpus, probes,
        threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(hits.keySet == Set(1L, 2L), hits)
    assert(hits(1L) == 1.0)
    assert(math.abs(hits(2L) - 0.707107) < 1e-6)
  }

  test("retrievalEval computes hand-checked precision/recall/MRR") {
    // 2-D geometry: query 0 = (1,0) label 1. Same-label a1=(1,.1),
    // a2=(1,-.2); other-label b1=(0,1), b2=(-1,0), b3=(.9,.1).
    // Exact top-3 by cosine: a1 (.995), b3 (.994), a2 (.981).
    val corpus = Seq(
      (0L, Seq(1f, 0f), 1), (1L, Seq(1f, 0.1f), 1), (2L, Seq(1f, -0.2f), 1),
      (3L, Seq(0f, 1f), 2), (4L, Seq(-1f, 0f), 2), (5L, Seq(0.9f, 0.1f), 2)
    ).toDF("vec_id", "embedding", "label")
    val queries = corpus.filter($"vec_id" === 0L)
    val r = VectorSearch.retrievalEval(corpus, queries, k = 3).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(1) == 2L, s"n_rel: $row")   // a1, a2
    assert(row.getLong(2) == 2L, s"hits: $row")    // a1, a2 in top-3
    assert(row.getDouble(3) == 2.0 / 3.0, s"p_at_k: $row")
    assert(row.getDouble(4) == 1.0, s"r_at_k: $row")
    assert(row.getDouble(5) == 1.0, s"mrr: $row")  // a1 at rank 1
  }

  test("retrievalEval: no relevant mass -> zero recall and MRR, n_rel 0") {
    val corpus = Seq(
      (0L, Seq(1f, 0f), 7), (1L, Seq(1f, 0.1f), 1), (2L, Seq(0f, 1f), 2)
    ).toDF("vec_id", "embedding", "label")
    val queries = corpus.filter($"vec_id" === 0L)
    val row = VectorSearch.retrievalEval(corpus, queries, k = 2).collect()(0)
    assert(row.getLong(1) == 0L && row.getLong(2) == 0L)
    assert(row.getDouble(3) == 0.0 && row.getDouble(4) == 0.0 &&
      row.getDouble(5) == 0.0)
  }

  test("ngramNovelty: first doc owns shared grams; short docs drop out") {
    val docs = Seq(
      (1L, "a b c d"),   // grams: "a b c", "b c d" -> both novel
      (2L, "a b c d"),   // same grams, first seen in 1 -> novelty 0
      (3L, "a b c x"),   // "a b c" seen, "b c x" novel -> 0.5
      (4L, "a b")        // < 3 tokens: no grams, no row
    ).toDF("doc_id", "text")
    val r = Dedup.ngramNovelty(docs, k = 3)
    val byDoc = r.collect().map(x =>
      x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(byDoc.keySet == Set(1L, 2L, 3L), byDoc)
    assert(byDoc(1L) == ((2L, 2L, 1.0)), byDoc)
    assert(byDoc(2L) == ((2L, 0L, 0.0)), byDoc)
    assert(byDoc(3L) == ((2L, 1L, 0.5)), byDoc)
    // saturation direction: replaying the corpus after itself can
    // only lower novelty, never raise it
    val again = Dedup.ngramNovelty(
      docs.union(docs.withColumn("doc_id", $"doc_id" + 10L)), k = 3)
    val lateNovel = again.filter($"doc_id" > 10L)
      .agg(sum($"novel")).collect()(0).getLong(0)
    assert(lateNovel == 0L, "replayed docs must contribute no novelty")
  }

  test("ngramNovelty plans without a cartesian or gram self-join") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val r = Dedup.ngramNovelty(docs, k = 3)
    val plan = r.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // totals are conserved: sum(novel) == number of distinct grams
    val total = r.agg(sum($"novel")).collect()(0).getLong(0)
    val grams = Dedup.shingleRows(docs, 3, "doc_id", "text")
      .select("shingle").distinct().count()
    assert(total == grams, s"$total != $grams")
  }
}
