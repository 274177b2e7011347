package graft.sources

import graft.ops.Transforms
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source + sink — the columnar sibling of the parquet catalog
  * (SURVEY §2.1/§2.2). The reference moves data between row stores
  * (reader/csvreader.py, writer/chwriter.py in /root/reference); a
  * Spark-native engine additionally interoperates with the Hadoop
  * warehouse formats, and ORC is the one Spark ships a native
  * vectorized reader for beyond parquet.
  *
  * Scale shape: ORC stripes split like parquet row-groups, so a
  * directory reads partition-parallel; predicate pushdown reaches
  * stripe/row-group indexes (min/max) the same way. `bloomFor`
  * columns additionally write per-stripe bloom filter indexes —
  * point-lookup predicates on those columns skip stripes without
  * scanning them, the file-format analog of
  * [[graft.dedup.Dedup.contaminationScanBloom]]'s pre-shuffle prune.
  */
object OrcSource {

  /** Read an ORC path. With a schema: one typed pass; without: ORC
    * carries its schema in the footer (unlike CSV, inference is a
    * footer read, not a data pass).
    */
  def read(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).orc(path)
  }

  /** Write as ORC, columns in sorted order for a deterministic
    * layout (the CSV sink's csvwriter.py:122 rule applied to the
    * sibling format). ZLIB compression — always available, and
    * dictionary + RLE encodings do the heavy lifting on TPC-H-shaped
    * columns anyway.
    */
  def write(df: DataFrame, path: String,
      bloomFor: Seq[String] = Nil): Unit = {
    val w = Transforms.sortedColumns(df).write
      .option("compression", "zlib")
    val wb =
      if (bloomFor.isEmpty) w
      else w.option("orc.bloom.filter.columns", bloomFor.mkString(","))
    wb.mode("overwrite").orc(path)
  }
}
