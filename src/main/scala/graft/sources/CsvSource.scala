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

  /** Sniff the CSV dialect from the first ~1 KiB, the reference's
    * `csv.Sniffer` move (reader/csvreader.py:32-37): delimiter =
    * the candidate splitting the first line into the most fields
    * (consistently with the second line); header = some column
    * whose second-row cell is numeric while the first-row cell is
    * not. Returns (delimiter, hasHeader).
    *
    * Driver-side by design: it opens ONE file and reads ~1 KiB —
    * exploration/onboarding only. Production readers pass explicit
    * options + schema (one typed pass, no sampling).
    */
  def sniff(spark: SparkSession, path: String,
      sampleBytes: Int = 1024): (String, Boolean) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .sortBy(_.getName).headOption
          .getOrElse(throw new java.io.FileNotFoundException(s"no files in $path"))
      else p
    val in = fs.open(file)
    val buf = new Array[Byte](sampleBytes)
    val n = try in.read(buf, 0, sampleBytes) finally in.close()
    val sample = new String(buf, 0, math.max(n, 0),
      java.nio.charset.StandardCharsets.UTF_8)
    val lines = sample.split("\r?\n").filter(_.nonEmpty).take(2)
    require(lines.nonEmpty, s"cannot sniff an empty file: $file")
    val candidates = Seq(",", ";", "\t", "|")
    val delimiter = candidates.maxBy { d =>
      val c1 = lines(0).split(java.util.regex.Pattern.quote(d), -1).length
      val c2 = if (lines.length > 1)
        lines(1).split(java.util.regex.Pattern.quote(d), -1).length else c1
      // reward many fields, require the two lines to agree
      if (c1 == c2) c1 else 0
    }
    def numeric(s: String) = s.nonEmpty &&
      scala.util.Try(s.trim.toDouble).isSuccess
    val hasHeader = lines.length > 1 && {
      val h = lines(0).split(java.util.regex.Pattern.quote(delimiter), -1)
      val r = lines(1).split(java.util.regex.Pattern.quote(delimiter), -1)
      h.zip(r).exists { case (hc, rc) => !numeric(hc) && numeric(rc) }
    }
    (delimiter, hasHeader)
  }

  /** Read with a sniffed dialect — the reference's zero-config CSV
    * open. Schema inference included (this is the exploration path;
    * see [[sniff]] for the production contract).
    */
  def readSniffed(spark: SparkSession, path: String): DataFrame = {
    val (delimiter, header) = sniff(spark, path)
    read(spark, path, schema = None, header = header, delimiter = delimiter)
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
