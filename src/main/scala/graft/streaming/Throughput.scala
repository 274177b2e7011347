package graft.streaming

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions.{count, lit}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** Throughput instrumentation — parity with the reference's
  * rows/sec + rows-per-event counters, logged every 100k rows
  * (reader/mysqlreader.py:135-153, 228-239 and pool/bbpool.py:159-173
  * in /root/reference). Spark already measures per-batch rates in its
  * streaming progress events; this surfaces them the way the
  * reference's PerformanceCounters do, without adding any work to the
  * data path.
  *
  * Scale note: both hooks are pure driver-side observers. The
  * streaming listener reads engine-computed progress (no extra jobs);
  * the batch helper piggybacks an `observe` count on an existing
  * action (no extra scan) — the same single-pass discipline as
  * Migrator's reconciliation count.
  */
object Throughput {

  /** One micro-batch's progress snapshot. */
  final case class BatchProgress(
      queryName: String,
      batchId: Long,
      numInputRows: Long,
      processedRowsPerSecond: Double)

  /** Streaming listener: logs one line per completed micro-batch
    * (`rows=… rows/sec=… total=…`) and accumulates totals — the
    * pump-loop counterpart of the reference's per-100k log lines.
    * Register with `spark.streams.addListener`.
    */
  final class PumpThroughputListener(log: String => Unit = Console.out.println)
      extends StreamingQueryListener {

    private val batchesRef =
      new AtomicReference[Vector[BatchProgress]](Vector.empty)
    private val totalRowsCounter = new AtomicLong(0L)

    def batches: Seq[BatchProgress] = batchesRef.get()
    def totalRows: Long = totalRowsCounter.get()

    override def onQueryStarted(event: QueryStartedEvent): Unit =
      log(s"[throughput] query=${Option(event.name).getOrElse(event.id)} started")

    override def onQueryProgress(event: QueryProgressEvent): Unit = {
      val p = event.progress
      val bp = BatchProgress(
        Option(p.name).getOrElse(p.id.toString), p.batchId,
        p.numInputRows, p.processedRowsPerSecond)
      batchesRef.updateAndGet(_ :+ bp)
      val total = totalRowsCounter.addAndGet(bp.numInputRows)
      log(f"[throughput] query=${bp.queryName} batch=${bp.batchId} " +
        f"rows=${bp.numInputRows} rows/sec=${bp.processedRowsPerSecond}%.1f " +
        f"total=$total")
    }

    override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
      log(s"[throughput] query=${event.id} terminated total=$totalRows")
  }

  /** Attach a fresh pump listener; returns it for inspection.
    * Callers remove it with `spark.streams.removeListener`.
    */
  def attach(spark: SparkSession,
      log: String => Unit = Console.out.println): PumpThroughputListener = {
    val l = new PumpThroughputListener(log)
    spark.streams.addListener(l)
    l
  }

  /** Batch-side helper: run `action` on a frame instrumented with an
    * observed row count and log rows + rows/sec for the action — the
    * one-shot-migration counterpart (tablemigrator.py's per-table
    * timing). Returns (action result, rows observed).
    */
  def timed[T](df: DataFrame, name: String,
      log: String => Unit = Console.out.println)(
      action: DataFrame => T): (T, Long) = {
    val obs = Observation(s"graft_throughput_$name")
    val t0 = System.nanoTime()
    val out = action(df.observe(obs, count(lit(1)).as("rows")))
    val rows = obs.get("rows").asInstanceOf[Long]
    val secs = (System.nanoTime() - t0) / 1e9
    log(f"[throughput] op=$name rows=$rows secs=$secs%.2f " +
      f"rows/sec=${if (secs > 0) rows / secs else 0d}%.1f")
    (out, rows)
  }
}
