package graft.streaming

import graft.cdc.CdcApplier
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.nio.charset.StandardCharsets

/** Continuous CDC pipeline: change-feed stream → `foreachBatch`
  * merge into a copy-on-write parquet state table.
  *
  * This replaces the reference's pump loop (pumper.py:13-47 +
  * mysqlreader.py:362-448 in /root/reference): Spark's micro-batch
  * engine IS the mempool (BBPool time-flush → trigger interval), the
  * checkpoint directory replaces the per-event binlog position file
  * (mysqlreader.py:356-360) — and upgrades its at-least-once
  * torn-write window to exactly-once, because merges are idempotent
  * (re-applying a replayed batch yields the same state) and offsets
  * commit atomically with the version pointer advancing.
  *
  * State layout: `stateDir/v<N>/` parquet snapshots plus a
  * `stateDir/_version` pointer; writers publish a new version then
  * flip the pointer, so readers never observe a half-written
  * snapshot (the same copy-on-write publish pattern table formats
  * use).
  */
object StreamingCdc {

  private val VersionFile = "_version"

  def currentVersion(spark: SparkSession, stateDir: String): Option[Long] = {
    val p = new Path(stateDir, VersionFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        // read to EOF — a single in.read(buf) may legally return a
        // short read and truncate the version string
        val out = new java.io.ByteArrayOutputStream(64)
        val buf = new Array[Byte](64)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(new String(out.toByteArray, StandardCharsets.UTF_8).trim.toLong)
      } finally in.close()
    }
  }

  /** Latest committed state snapshot (empty schema-less read is the
    * caller's bootstrap concern — pass the template for v0).
    */
  def currentState(spark: SparkSession, stateDir: String,
      template: DataFrame): DataFrame =
    currentVersion(spark, stateDir) match {
      case Some(v) => spark.read.parquet(s"$stateDir/v$v")
      case None    => template.limit(0)
    }

  /** First replicated row, recorded once at stream start — the
    * reference logs it per table so operators can craft the
    * migration cut-over WHERE clause (mysqlreader.py:241-245,
    * docs/manual.md:555-592). Persisted as `_first_row.json` next
    * to the state so it survives the process.
    */
  def firstRow(spark: SparkSession, stateDir: String): Option[String] = {
    val p = new Path(stateDir, FirstRowFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream(256)
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(new String(out.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  private val FirstRowFile = "_first_row.json"

  private def recordFirstRow(batch: DataFrame, stateDir: String,
      orderCols: Seq[String]): Unit =
    batch.orderBy(orderCols.map(col): _*).limit(1).toJSON.collect()
      .headOption.foreach { json =>
        val p = new Path(stateDir, FirstRowFile)
        val fs = p.getFileSystem(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        // replay-safe: keep the original record if a crash-replayed
        // first batch runs again
        if (!fs.exists(p)) {
          val out = fs.create(p, false)
          try out.write(json.getBytes(StandardCharsets.UTF_8))
          finally out.close()
        }
      }

  /** Merge one batch and publish the next version. Idempotent for a
    * replayed batch: last-write-wins per key means re-applying the
    * same changes to the already-merged state is a no-op.
    */
  def mergeIntoState(batch: DataFrame, stateDir: String, pk: Seq[String],
      orderCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val template = batch.drop(CdcApplier.OpCol)
    val state = currentState(spark, stateDir, template)
    if (currentVersion(spark, stateDir).isEmpty)
      recordFirstRow(batch, stateDir, orderCols)
    val next = CdcApplier.applyBatch(state, batch, pk, orderCols.map(col))
    val v = currentVersion(spark, stateDir).getOrElse(-1L) + 1
    next.write.mode("overwrite").parquet(s"$stateDir/v$v")
    // Atomic publish: write the pointer to a temp name, then rename
    // over the old one — readers see either the previous version or
    // the new one, never a torn write (rename is atomic on HDFS and
    // posix local FS; fs.create(p, overwrite) alone is not).
    val p = new Path(stateDir, VersionFile)
    val tmp = new Path(stateDir, s".$VersionFile.v$v.tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"failed to publish version pointer $p")
  }

  /** Retire state versions older than the newest `keep` — the
    * vacuum step every copy-on-write table needs: without it a
    * long-running pump accumulates one full table copy per
    * micro-batch. Never touches the current version or the pointer;
    * readers of retained versions are unaffected (same contract as
    * table-format vacuums: retention must exceed the longest
    * reader).
    */
  def vacuum(spark: SparkSession, stateDir: String, keep: Int = 2): Unit = {
    require(keep >= 1, "must keep at least the current version")
    currentVersion(spark, stateDir).foreach { v =>
      val root = new Path(stateDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("v"))
          n.drop(1).toLongOption.foreach { ver =>
            if (ver <= v - keep) fs.delete(st.getPath, true)
          }
      }
    }
  }

  /** Start the pump. `processingTime = None` maps the reference's
    * `--src-wait` OFF (drain available data, then exit —
    * Trigger.AvailableNow); `Some(interval)` maps `--src-wait` +
    * `--nice-pause` (stay up, batch on a cadence —
    * Trigger.ProcessingTime), per SURVEY §2.10 T4.
    */
  def start(feed: DataFrame, stateDir: String, checkpointDir: String,
      pk: Seq[String], orderCols: Seq[String],
      processingTime: Option[String] = None): StreamingQuery = {
    val trigger = processingTime
      .map(Trigger.ProcessingTime(_))
      .getOrElse(Trigger.AvailableNow())
    feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeIntoState(batch, stateDir, pk, orderCols)
      }
      .start()
  }
}
