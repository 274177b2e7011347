package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (the Bench/Verify/ScaleUp family, not library surface):
  * scale soak of the round-6 text/LM operators — cross-doc
  * exact-substring dedup rewrite, stupid-backoff bigram perplexity,
  * and the Naive Bayes classifier — over the documents table of
  * whatever scale dir it is pointed at. Reports seconds and output
  * cardinalities as one JSON line; run it at sf0.1 and at a ScaleUp
  * 10× dir and compare growth. All three should track the corpus
  * roughly linearly: the gram-frequency aggregate and the
  * collect_set removal lists in substrDedupCut are doc-length-
  * bounded, the bigram aggregate is corpus-keyed with a
  * TakeOrdered pruning, and the NB model is broadcastable at any
  * corpus size — a super-linear jump means one of those contracts
  * broke.
  *
  * `runMain graft.SoakTextOps <sfDir>`
  */
object SoakTextOps {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // NOT checkpointed: a corpus-sized localCheckpoint would bound
    // the soakable corpus by local block storage and distort the
    // first timed operator with spill — each operator re-scans the
    // parquet source, exactly as it would in production
    val docs = Tables.load(spark, sfDir, "documents")
    val nDocs = docs.count()

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // the q113 shape: 8-gram cross-doc ownership, min-id keeper
    val (nSub, tSub) = timed {
      text.TextAnalysis.substrDedupCut(docs, n = 8).count()
    }
    // the q116 shape: pruned bigram LM, 256-bigram vocabulary
    val (nLm, tLm) = timed {
      text.LanguageModel.stupidBackoffPerplexity(docs, vb = 256).count()
    }
    // the q118 shape: corpus-trained NB over the lang label
    val (nNb, tNb) = timed {
      text.Classifier.naiveBayes(docs, classCol = "lang", v = 64).count()
    }
    println(s"""{"sfDir":"$sfDir","docs":$nDocs,""" +
      s""""substr_rows":$nSub,"substr_sec":${f"$tSub%.2f"},""" +
      s""""backoff_rows":$nLm,"backoff_sec":${f"$tLm%.2f"},""" +
      s""""nb_rows":$nNb,"nb_sec":${f"$tNb%.2f"}}""")
    spark.stop()
  }
}
