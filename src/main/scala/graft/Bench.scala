package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. Per query: one untimed warmup run (session/JIT/
  * parquet-footer warmup), then one timed run materialized through
  * the noop sink (full evaluation of every row/column — `.count()`
  * would let Catalyst drop top-level sorts and projects and
  * understate real work).
  *
  * A query that throws is a loud failure: recorded in the JSON under
  * "errors", timed as -1, and the process exits nonzero — a
  * regression can't silently look like a fast success.
  *
  * The one-line JSON goes to stdout AND to a file (sbt wraps forked
  * stdout in log decoration which can defeat line-oriented parsing;
  * the file is the reliable channel).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_OUT"))
      .getOrElse("/root/repo/BENCH_LOCAL.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_BENCH_ONLY=q24_ngram_jaccard,q41_dup_clusters —
    // iterate on a subset without the full sweep (record format is
    // unchanged; the driver never sets this)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(SparkEntry.benchExclude)
      .filter(n => only.forall(_.contains(n)))

    def runOnce(name: String): Option[String] =
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        None
      } catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${e.getMessage}") }

    // Drop persisted blocks between runs: several queries
    // localCheckpoint intermediates (dedup indexes, prepared vector
    // frames), and without an explicit unpersist those blocks pile up
    // in the block manager across the whole bench — the timed queries
    // then pay GC/eviction for the warmup pass's leftovers.
    def clearState(): Unit = {
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    // warmup pass (untimed)
    names.foreach(runOnce)
    clearState()
    // clearState drops persisted blocks but not the heap/codegen-cache
    // debt of the warmup pass — without an explicit GC plus one
    // sacrificial untimed query, the FIRST timed queries absorb the
    // whole sweep's garbage (measured: q01 7.1s in-sweep vs 1.6s
    // isolated) and the record lies about them.
    System.gc()
    names.headOption.foreach(runOnce)
    clearState()
    System.gc()

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val err = runOnce(name)
      err.foreach(errors += name -> _)
      val secs = (System.nanoTime() - t0) / 1e9
      clearState() // outside the timed window
      name -> (if (err.isEmpty) secs else -1.0)
    }

    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                  case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    val qs = results.map { case (k, v) => s""""${esc(k)}":$v""" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get(outPath), line + "\n")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
