package graft.sources

import graft.ops.Transforms
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source + sink — the third file format of the ingest
  * surface (SURVEY §2.1/§2.2 alongside parquet and CSV). The
  * reference reads only CSV files (reader/csvreader.py:22-58 in
  * /root/reference), but its CDC feed is JSON-shaped row events;
  * a JSON-lines file source is the batch face of the same envelope
  * (and the native format of the Debezium feed the streaming path
  * consumes).
  *
  * Scale shape: JSON-lines is splittable by newline, so a directory
  * of part files reads partition-parallel like CSV/parquet. Schema
  * should be supplied on read at scale — `inferSchema`-style
  * sampling is an extra pass over 100 TB; with an explicit
  * StructType the scan is single-pass and the parser projects only
  * the requested fields.
  */
object JsonSource {

  /** Read a JSON-lines path. With a schema: one typed pass; without:
    * Spark samples to infer (exploration only — costs an extra scan).
    */
  def read(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** Write as JSON lines, columns in sorted order for a
    * deterministic layout (the CSV sink's csvwriter.py:122 rule
    * applied to the sibling format). `stringify` applies the
    * standard sink conversion for non-scalar columns when a
    * downstream consumer wants flat strings.
    */
  def write(df: DataFrame, path: String, stringify: Boolean = false): Unit = {
    val flat = if (stringify) Transforms.stringifyForSink(df) else df
    Transforms.sortedColumns(flat).write
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .mode("overwrite")
      .json(path)
  }
}
