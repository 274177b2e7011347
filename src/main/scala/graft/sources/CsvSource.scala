package graft.sources

import graft.ops.Transforms
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source + sink (SURVEY §2.1 S3 / §2.2 K2).
  *
  * The reference sniffs the dialect and header from the first 1 KiB
  * (reader/csvreader.py:32-37 in /root/reference) and treats every
  * value as a string with '' mapped to NULL on read
  * (converter/csvreadconverter.py:10-22); the writer emits a header
  * once and sorts fieldnames for a deterministic layout
  * (writer/csvwriter.py:84-137, sort at :122). Spark's CSV
  * datasource replaces sniffing with explicit options — schema-on
  * read when a `StructType` is supplied, else header + inference —
  * and scales to a directory of part files read in parallel
  * (splittable, partition-parallel at 100 TB, unlike the
  * single-file row loop of the reference).
  */
object CsvSource {

  /** Read a CSV path. `'' → NULL` comes from `nullValue ""` — the
    * explicit form of the reference's csvreadconverter; pass a
    * schema for typed columns (CSV itself is untyped), or let
    * `inferSchema` sample when exploring.
    */
  def read(spark: SparkSession, path: String,
      schema: Option[StructType] = None, header: Boolean = true,
      delimiter: String = ","): DataFrame = {
    val r = spark.read
      .option("header", header)
      .option("delimiter", delimiter)
      .option("nullValue", "")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
    schema.fold(r.option("inferSchema", true))(s => r.schema(s)).csv(path)
  }

  /** Write as CSV: header, lexicographically sorted columns
    * (csvwriter.py:122), NULL as empty string, timestamps in the
    * reference's '%Y-%m-%d %H:%M:%S' shape. Non-scalar columns must
    * be stringified first — `stringify = true` applies the standard
    * sink conversion (binary → hex, complex → JSON;
    * chwriteconverter.py:17-41).
    */
  def write(df: DataFrame, path: String, header: Boolean = true,
      stringify: Boolean = false): Unit = {
    val flat = if (stringify) Transforms.stringifyForSink(df) else df
    Transforms.sortedColumns(flat).write
      .option("header", header)
      .option("nullValue", "")
      .option("emptyValue", "")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .mode("overwrite")
      .csv(path)
  }
}
