package graft.streaming

import graft.cdc.CdcApplier
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.nio.charset.StandardCharsets

/** Continuous CDC pipeline: change-feed stream → `foreachBatch`
  * merge into a hash-bucketed copy-on-write parquet state table.
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
  * State layout — partitioned so a micro-batch rewrites only the
  * key-buckets it touches (a whole-snapshot rewrite is the classic
  * copy-on-write scale killer: at 100 TB state a 1k-row batch would
  * re-copy 100 TB):
  *
  * {{{
  * stateDir/
  *   _version                      global version counter N (atomic rename publish)
  *   manifest/v<N>                 text manifest: numBuckets + bucket -> writer version
  *   v<M>/graft_bucket=<i>/part-...parquet   bucket i's snapshot, written by version M
  * }}}
  *
  * Bucket of a key = `pmod(hash(pk...), numBuckets)`. A merge at
  * version N reads ONLY the touched buckets' current snapshots,
  * applies the batch, and writes the merged touched buckets under
  * `v<N>/`; untouched buckets keep their existing files, and the new
  * manifest points them at their old version dirs. Readers resolve
  * `_version` → manifest → bucket paths, so they never observe a
  * half-written snapshot (writers publish manifest + data first,
  * pointer last; old dirs are never mutated).
  */
object StreamingCdc {

  private val VersionFile = "_version"
  private val ManifestDir = "manifest"

  /** Bucket partition column. Deliberately NOT `_`-prefixed: Spark's
    * file listing treats `_`/`.`-prefixed paths as hidden, so a
    * `_bucket=i` partition directory would be invisible to readers.
    */
  val BucketCol = "graft_bucket"

  /** Default key-bucket count. A production deployment sizes this to
    * state volume (buckets ≈ state_bytes / target_rewrite_bytes) —
    * the dial trades rewrite amplification (fewer buckets → bigger
    * rewrites) against small-file count (more buckets → more files).
    */
  val DefaultNumBuckets = 64

  /** bucket → version dir that last rewrote that bucket. A bucket
    * absent from the map is empty (all its keys deleted or never
    * seen).
    */
  private case class Manifest(numBuckets: Int, buckets: Map[Int, Long])

  // ---- small atomic-file helpers (single text blob, rename publish) ----

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readTextFile(spark: SparkSession, p: Path): Option[String] = {
    val fs = fsFor(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        // read to EOF — a single in.read(buf) may legally return a
        // short read and truncate the content
        val out = new java.io.ByteArrayOutputStream(256)
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(new String(out.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  /** Write-then-rename publish: readers see the old file or the new
    * one, never a torn write (rename is atomic on HDFS and posix
    * local FS; fs.create(p, overwrite) alone is not).
    */
  private def publishTextFile(spark: SparkSession, p: Path, content: String): Unit = {
    val fs = fsFor(spark, p)
    fs.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"failed to publish $p")
  }

  def currentVersion(spark: SparkSession, stateDir: String): Option[Long] =
    readTextFile(spark, new Path(stateDir, VersionFile)).map(_.trim.toLong)

  private def manifestPath(stateDir: String, v: Long): Path =
    new Path(s"$stateDir/$ManifestDir", s"v$v")

  private def readManifest(spark: SparkSession, stateDir: String, v: Long): Manifest = {
    val text = readTextFile(spark, manifestPath(stateDir, v)).getOrElse(
      throw new java.io.IOException(
        s"state manifest missing for committed version $v at $stateDir"))
    val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    val k = lines.head.stripPrefix("numBuckets=").toInt
    val buckets = lines.tail.map { l =>
      val Array(b, bv) = l.split('=')
      b.toInt -> bv.toLong
    }.toMap
    Manifest(k, buckets)
  }

  private def writeManifest(spark: SparkSession, stateDir: String, v: Long,
      m: Manifest): Unit = {
    val body = (s"numBuckets=${m.numBuckets}" +:
      m.buckets.toSeq.sorted.map { case (b, bv) => s"$b=$bv" }).mkString("\n")
    publishTextFile(spark, manifestPath(stateDir, v), body)
  }

  private def bucketDir(stateDir: String, b: Int, v: Long): String =
    s"$stateDir/v$v/$BucketCol=$b"

  /** Latest committed state snapshot (empty schema-less read is the
    * caller's bootstrap concern — pass the template for v0). Reads
    * each bucket from the version dir that last rewrote it.
    */
  def currentState(spark: SparkSession, stateDir: String,
      template: DataFrame): DataFrame =
    currentVersion(spark, stateDir) match {
      case Some(v) =>
        val m = readManifest(spark, stateDir, v)
        if (m.buckets.isEmpty) template.limit(0)
        else {
          val paths = m.buckets.toSeq.sorted.map { case (b, bv) =>
            bucketDir(stateDir, b, bv)
          }
          spark.read.schema(template.schema).parquet(paths: _*)
        }
      case None => template.limit(0)
    }

  /** First replicated row, recorded once at stream start — the
    * reference logs it per table so operators can craft the
    * migration cut-over WHERE clause (mysqlreader.py:241-245,
    * docs/manual.md:555-592). Persisted as `_first_row.json` next
    * to the state so it survives the process.
    */
  def firstRow(spark: SparkSession, stateDir: String): Option[String] =
    readTextFile(spark, new Path(stateDir, FirstRowFile))

  private val FirstRowFile = "_first_row.json"

  private def recordFirstRow(batch: DataFrame, stateDir: String,
      orderCols: Seq[String]): Unit =
    batch.orderBy(orderCols.map(col): _*).limit(1).toJSON.collect()
      .headOption.foreach { json =>
        val p = new Path(stateDir, FirstRowFile)
        val fs = fsFor(batch.sparkSession, p)
        // replay-safe: keep the original record if a crash-replayed
        // first batch runs again
        if (!fs.exists(p)) {
          val out = fs.create(p, false)
          try out.write(json.getBytes(StandardCharsets.UTF_8))
          finally out.close()
        }
      }

  /** Merge one batch and publish the next version, rewriting ONLY
    * the key-buckets the batch touches. Idempotent for a replayed
    * batch: last-write-wins per key means re-applying the same
    * changes to the already-merged buckets is a no-op.
    *
    * Scale shape: touched-bucket discovery is one distinct over the
    * (small) batch collecting ≤ numBuckets ints to the driver; the
    * state read and the merged write are proportional to the touched
    * buckets' size, not total state size.
    */
  def mergeIntoState(rawBatch: DataFrame, stateDir: String, pk: Seq[String],
      orderCols: Seq[String],
      numBuckets: Int = DefaultNumBuckets): Unit = {
    val spark = rawBatch.sparkSession
    // expand PK-moving updates BEFORE deriving the state template:
    // normalization drops the transient `_before_<pk>` columns, which
    // must not become part of the persisted state schema
    val batch = CdcApplier.normalizePkChanges(rawBatch, pk)
    val template = batch.drop(CdcApplier.OpCol)
    require(!template.columns.contains(BucketCol),
      s"state schema must not contain reserved column $BucketCol")
    val curV = currentVersion(spark, stateDir)
    if (curV.isEmpty) recordFirstRow(batch, stateDir, orderCols)
    val manifest = curV.map(readManifest(spark, stateDir, _))
      .getOrElse(Manifest(numBuckets, Map.empty))
    val k = manifest.numBuckets
    val bucketOf = pmod(hash(pk.map(col): _*), lit(k))

    // driver-sized by construction: at most k distinct bucket ids
    val touched = batch.select(bucketOf.as("b")).distinct()
      .collect().map(_.getInt(0)).toSet
    val touchedWithState = manifest.buckets.filter { case (b, _) => touched(b) }
    val state =
      if (touchedWithState.isEmpty) template.limit(0)
      else {
        val paths = touchedWithState.toSeq.sorted.map { case (b, bv) =>
          bucketDir(stateDir, b, bv)
        }
        spark.read.schema(template.schema).parquet(paths: _*)
      }

    val next = CdcApplier.applyBatch(state, batch, pk, orderCols.map(col))
    val v = curV.getOrElse(-1L) + 1
    next.withColumn(BucketCol, bucketOf)
      .write.mode("overwrite").partitionBy(BucketCol).parquet(s"$stateDir/v$v")

    // A touched bucket whose keys all got deleted writes no partition
    // dir — it must leave the manifest (absent = empty), so list what
    // the write actually produced instead of assuming `touched`.
    val vPath = new Path(s"$stateDir/v$v")
    val fs = fsFor(spark, vPath)
    val written = fs.listStatus(vPath).iterator
      .map(_.getPath.getName)
      .filter(_.startsWith(s"$BucketCol="))
      .map(_.stripPrefix(s"$BucketCol=").toInt)
      .toSet
    val nextBuckets = (manifest.buckets -- touched) ++ written.map(_ -> v)
    writeManifest(spark, stateDir, v, Manifest(k, nextBuckets))
    // Atomic publish: manifest + data land first, pointer flips last.
    publishTextFile(spark, new Path(stateDir, VersionFile), v.toString)
  }

  /** Retire state older than the newest `keep` versions — the vacuum
    * step every copy-on-write table needs: without it a long-running
    * pump accumulates dead bucket copies. Manifest-aware: a version
    * dir survives as long as ANY retained manifest references one of
    * its buckets (an untouched bucket keeps its original version dir
    * alive arbitrarily long — that dir still holds live data).
    * Readers of retained versions are unaffected (same contract as
    * table-format vacuums: retention must exceed the longest reader).
    */
  def vacuum(spark: SparkSession, stateDir: String, keep: Int = 2): Unit = {
    require(keep >= 1, "must keep at least the current version")
    currentVersion(spark, stateDir).foreach { v =>
      val floor = v - keep + 1
      val referenced: Set[Long] = (math.max(0L, floor) to v).flatMap { mv =>
        readTextFile(spark, manifestPath(stateDir, mv)).toSeq.flatMap { text =>
          text.linesIterator.map(_.trim).filter(_.nonEmpty).drop(1)
            .map(_.split('=')(1).toLong)
        }
      }.toSet
      val root = new Path(stateDir)
      val fs = fsFor(spark, root)
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("v"))
          n.drop(1).toLongOption.foreach { ver =>
            if (ver < floor && !referenced.contains(ver))
              fs.delete(st.getPath, true)
          }
      }
      val mdir = new Path(stateDir, ManifestDir)
      if (fs.exists(mdir)) fs.listStatus(mdir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("v"))
          n.drop(1).toLongOption.foreach { ver =>
            if (ver < floor) fs.delete(st.getPath, false)
          }
      }
    }
  }

  /** Route one multiplexed change batch into per-table state dirs —
    * the reference's independent per-`schema.table` belts
    * (pool/bbpool.py:13-18, 64-78 in /root/reference) re-expressed as
    * one partitioned state tree: a feed carrying routing columns
    * (e.g. the Debezium adapter's `db`, `table`) merges each table's
    * slice into `stateRoot/<db>__<table>` (the reference's composed
    * naming, DdlBuilder-compatible).
    *
    * Scale shape: the routing-value distinct is driver-sized by
    * construction (bounded by the subscription list, P4). Crash
    * recovery composes with per-table merge idempotence: a batch that
    * died between table A and table B replays both; A's re-merge is a
    * no-op, B's completes — same exactly-once outcome.
    */
  def mergeMultiplexed(batch: DataFrame, stateRoot: String, pk: Seq[String],
      orderCols: Seq[String], routingCols: Seq[String] = Seq("db", "table"),
      numBuckets: Int = DefaultNumBuckets): Unit = {
    val tables = batch.select(routingCols.map(col): _*).distinct()
      .collect().map(r => routingCols.indices.map(r.getString))
    tables.foreach { t =>
      val slice = routingCols.zip(t).foldLeft(batch) { case (df, (c, v)) =>
        df.filter(col(c) === v)
      }.drop(routingCols: _*)
      mergeIntoState(slice, s"$stateRoot/${t.mkString("__")}", pk,
        orderCols, numBuckets)
    }
  }

  /** Start a multi-table pump over a multiplexed feed: one streaming
    * query, one checkpoint, per-table state dirs (T2). Tables share
    * the pk/orderCols convention (the reference assumes a uniform
    * `id` key across its belt map; graft at least takes the real
    * column list).
    */
  def startMultiplexed(feed: DataFrame, stateRoot: String,
      checkpointDir: String, pk: Seq[String], orderCols: Seq[String],
      routingCols: Seq[String] = Seq("db", "table"),
      processingTime: Option[String] = None,
      numBuckets: Int = DefaultNumBuckets): StreamingQuery = {
    val trigger = processingTime
      .map(Trigger.ProcessingTime(_))
      .getOrElse(Trigger.AvailableNow())
    feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeMultiplexed(batch, stateRoot, pk, orderCols, routingCols,
          numBuckets)
      }
      .start()
  }

  /** Start the pump. `processingTime = None` maps the reference's
    * `--src-wait` OFF (drain available data, then exit —
    * Trigger.AvailableNow); `Some(interval)` maps `--src-wait` +
    * `--nice-pause` (stay up, batch on a cadence —
    * Trigger.ProcessingTime), per SURVEY §2.10 T4.
    */
  def start(feed: DataFrame, stateDir: String, checkpointDir: String,
      pk: Seq[String], orderCols: Seq[String],
      processingTime: Option[String] = None,
      numBuckets: Int = DefaultNumBuckets): StreamingQuery = {
    val trigger = processingTime
      .map(Trigger.ProcessingTime(_))
      .getOrElse(Trigger.AvailableNow())
    feed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeIntoState(batch, stateDir, pk, orderCols, numBuckets)
      }
      .start()
  }
}
