package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** Scan one table. Column pruning + predicate pushdown reach the
    * parquet reader automatically via Catalyst when callers
    * select/filter on the result.
    *
    * The `events` fixture carries a TIMESTAMP(NANOS) column, which
    * Spark's parquet reader rejects by default; we read nanos as a
    * long and truncate to microseconds — the same truncation DuckDB
    * applies when it surfaces the column as TIMESTAMP (µs).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(dir, name))
    val tsNanoCols = df.schema.fields.collect {
      case f if f.dataType == LongType && f.name == "ts" && name == "events" => f.name
    }
    tsNanoCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
    }
  }

  /** Table-list discovery with prefix matching — the Spark-side analog
    * of the reference's `SHOW TABLES` + `--src-tables-prefixes`
    * resolution (tableprocessor.py:118-144).
    */
  def tablesWithPrefix(prefix: String): Seq[String] =
    all.filter(_.startsWith(prefix))
}
