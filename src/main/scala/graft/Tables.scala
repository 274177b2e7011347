package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Parquet-backed table catalog over a scale-factor directory.
  *
  * Plays the role of the reference's MySQL catalog scan
  * (tableprocessor.py:63-144, dbclient/mysqlclient.py:87-121 in
  * /root/reference): table discovery, prefix expansion, and schema
  * introspection — here backed by parquet files, in production by any
  * Spark DataSource (JDBC, Delta, ...).
  */
object Tables {
  /** All driver-generated fixture tables (TESTDATA.md). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Columns stored as parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects by default and, with `nanosAsLong`, surfaces as raw
    * longs. Detected generically from the parquet footer of one data
    * file (never by table/column name), cached per path — one footer
    * read per table per JVM, negligible even with thousands of
    * tables.
    */
  private val nanoColsCache = new ConcurrentHashMap[String, Seq[String]]()

  private def nanoTimestampCols(spark: SparkSession, p: String): Seq[String] =
    nanoColsCache.computeIfAbsent(p, { _ =>
      val conf = spark.sparkContext.hadoopConfiguration
      val root = new Path(p)
      val fs = root.getFileSystem(conf)
      val dataFile = fs.listStatus(root).iterator
        .map(_.getPath)
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      dataFile.toSeq.flatMap { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try {
          reader.getFooter.getFileMetaData.getSchema.getFields.asScala.collect {
            case fld if fld.isPrimitive &&
              (fld.getLogicalTypeAnnotation match {
                case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                  t.getUnit == TimeUnit.NANOS
                case _ => false
              }) => fld.getName
          }.toSeq
        } finally reader.close()
      }
    })

  /** Scan one table. Column pruning + predicate pushdown reach the
    * parquet reader automatically via Catalyst when callers
    * select/filter on the result.
    *
    * TIMESTAMP(NANOS) columns (detected from parquet metadata) are
    * read as longs and truncated to microseconds — the same
    * truncation DuckDB applies when it surfaces such a column as
    * TIMESTAMP (µs).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Required before the scan; set once per session (idempotent
    // check avoids re-triggering conf-change invalidation per call).
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    if (spark.conf.getOption(k).getOrElse("false") != "true")
      spark.conf.set(k, "true")
    val p = path(dir, name)
    val nanoCols = nanoTimestampCols(spark, p).toSet
    val df = spark.read.parquet(p)
    df.schema.fields.collect {
      case f if f.dataType == LongType && nanoCols(f.name) => f.name
    }.foldLeft(df) { (d, c) =>
      d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
    }
  }

  /** Table-list discovery with prefix matching — the Spark-side analog
    * of the reference's `SHOW TABLES` + `--src-tables-prefixes`
    * resolution (tableprocessor.py:118-144).
    */
  def tablesWithPrefix(prefix: String): Seq[String] =
    all.filter(_.startsWith(prefix))

  private val bytesCache = new ConcurrentHashMap[String, java.lang.Long]()

  /** Total on-disk bytes of a table path (file, or directory of
    * files), via the path's own Hadoop FileSystem; cached per path —
    * one FS metadata call per table per JVM.
    */
  private def tableBytes(spark: SparkSession, p: String): Long =
    bytesCache.computeIfAbsent(p, { _ =>
      val root = new Path(p)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(root).getLength
    })

  /** [[load]] plus a scale-adaptive parallelism floor for scans that
    * feed EXPENSIVE per-row work (tokenize/shingle/gram explode,
    * vector math): a file smaller than `cores × openCostInBytes`
    * cannot produce `cores` non-empty splits (Spark charges every
    * file `openCostInBytes` when packing splits, and a single small
    * row group lands in one split regardless), so the whole
    * downstream projection runs on ONE core while the rest idle —
    * measured at sf0.1: q164's gram pass was a single 6.7 s task on
    * local[32]. In that regime ONE round-robin exchange, bounded by
    * that same small input size, buys full-core parallelism for the
    * per-row work. At production scale (table ≥ cores ×
    * openCostInBytes, e.g. ≥ 128 MB on 32 cores) the scan itself
    * provides the parallelism and this is exactly [[load]] — the
    * branch is decided from INPUT SIZE, never a tuned constant, so
    * the same code is right at sf0.001 and at 100 TB.
    *
    * Callers must only use it where row order and partitioning are
    * semantically irrelevant (the library's determinism discipline:
    * exact integer/decimal aggregates, per-row projections) — every
    * call site stays oracle-checked.
    */
  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = load(spark, dir, name)
    val cores = spark.sparkContext.defaultParallelism
    val openCost = spark.conf.get("spark.sql.files.openCostInBytes",
      (4 * 1024 * 1024).toString).toLong
    if (tableBytes(spark, path(dir, name)) < cores.toLong * openCost)
      df.repartition(cores)
    else df
  }
}
