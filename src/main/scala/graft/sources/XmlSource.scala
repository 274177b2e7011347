package graft.sources

import graft.ops.Transforms
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** XML source + sink — the third interchange format beside CSV
  * (sources/CsvSource.scala) and JSON-lines (sources/JsonSource.scala).
  * The reference's interchange surface is CSV spill files
  * (writer/csvwriter.py in /root/reference); enterprise MySQL
  * estates additionally exchange XML dumps (`mysqldump --xml`,
  * `LOAD XML`), so a Spark-native engine should speak it. Spark 4
  * ships the XML data source in spark-sql proper (the former
  * spark-xml package) — no extra dependency.
  *
  * Scale shape: one document per row under a shared `rowTag`, so a
  * written directory is line-splittable the way the JSON sink is;
  * reads with an explicit schema are a single typed pass (schema
  * inference over XML is a full extra data pass — exploration only,
  * production passes the schema, same contract as CsvSource).
  *
  * Round-trip contract — NARROWER than the CSV/JSON sinks': XML 1.0
  * cannot encode control characters (legal in parquet/JSON strings),
  * so strings containing them do not survive this format — route
  * such tables through CSV or JSON-lines. Surrounding whitespace in
  * string values IS preserved: the reader pins
  * `ignoreSurroundingSpaces=false` (locked by a unit test with
  * leading/trailing-space fixtures) so `" padded "` round-trips
  * byte-identical rather than being silently trimmed.
  */
object XmlSource {

  val RowTag = "row"
  val RootTag = "rows"

  /** Microsecond ISO timestamp format shared by [[read]] and
    * [[write]] — one literal, so the two sides can never drift apart
    * and silently break the round-trip (q147 depends on it).
    */
  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Read an XML path written by [[write]] (or any single-level
    * rowTag document). With a schema: one typed pass. Timestamps
    * parse back through the same ISO format the sink writes.
    */
  def read(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format("xml")
      .option("rowTag", RowTag)
      .option("ignoreSurroundingSpaces", "false")
      .option("timestampFormat", TsFormat)
    schema.fold(r)(s => r.schema(s)).load(path)
  }

  /** Write as XML, columns in sorted order for a deterministic
    * layout (csvwriter.py:122's sorted-fieldnames rule applied to
    * the third interchange format). NULL fields are omitted from the
    * row element — the XML analog of the CSV sink's NULL → ''
    * convention — and read back as NULL under the explicit schema.
    */
  def write(df: DataFrame, path: String): Unit = {
    Transforms.sortedColumns(df).write.format("xml")
      .option("rowTag", RowTag)
      .option("rootTag", RootTag)
      .option("timestampFormat", TsFormat)
      .mode("overwrite")
      .save(path)
  }
}
