package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC write sink (SURVEY §2.2) — the Spark-native form of the
  * reference's primary sink, a live multi-row INSERT pump into
  * ClickHouse (writer/chwriter.py:47-112 in /root/reference, batching
  * mandated by docs/manual.md:267 — "INSERTs are extremely slow
  * one-by-one"). Spark's JDBC writer IS that multi-row batcher: each
  * partition opens one connection and flushes `batchsize`-row
  * prepared-statement batches, so parallelism = partitions and
  * rows-per-INSERT = batchsize — the reference's two throughput
  * dials, distributed.
  *
  * Scale shape: `numPartitions` caps concurrent connections (a
  * 1000-partition frame must not open 1000 connections against one
  * server — coalesce to the connection budget, no shuffle);
  * `isolationLevel = READ_UNCOMMITTED` keeps bulk appends off the
  * transaction log where the target allows it, matching the
  * reference's autocommit batches.
  */
object JdbcSink {

  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Append,
      batchSize: Int = 10000,
      isolationLevel: String = "READ_UNCOMMITTED",
      driver: Option[String] = None,
      numPartitions: Option[Int] = None): Unit = {
    // coalesce (not repartition): capping connections must not buy a
    // shuffle; partition count only ever shrinks here
    val shaped = numPartitions
      .filter(_ < df.rdd.getNumPartitions)
      .fold(df)(df.coalesce)
    val w = shaped.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .option("isolationLevel", isolationLevel)
    driver.fold(w)(d => w.option("driver", d)).mode(mode).save()
  }
}
