package graft.sources

import graft.schema.DdlBuilder
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Managed-table batch sink (SURVEY §2.2 K1) — the Spark-native
  * analog of the reference's ClickHouse batch INSERT
  * (writer/chwriter.py:47-112 in /root/reference): resolve the
  * destination name, create the database if needed, append/overwrite
  * through the catalog. Partition layout mirrors
  * DdlBuilder.createTableSpark: a derived `<dateCol>_month` column
  * partitions the table by month of the primary date field, so date
  * predicates prune partitions at 100 TB.
  */
object TableSink {

  /** Destination resolution incl. the distributed `_all` rename the
    * reference applies for cluster writes (chwriter.py:35-38) —
    * naming parity only; Spark's execution model replaces the
    * Distributed engine.
    */
  def resolveName(db: String, table: String, distributed: Boolean): String =
    if (distributed) s"$db.${DdlBuilder.distributedName(db, table)}"
    else s"$db.$table"

  /** Write a managed table; partitioned by month of the first
    * date/timestamp column (when present), matching the generated
    * DDL. Returns the derived partition column name, if any.
    */
  def writeManaged(df: DataFrame, db: String, table: String,
      mode: SaveMode = SaveMode.Append,
      distributed: Boolean = false): Option[String] = {
    val spark = df.sparkSession
    spark.sql(DdlBuilder.createDatabase(db))
    val dateCol = DdlBuilder.primaryDateField(df.schema)
    val (out, partCol) = dateCol match {
      case Some(f) =>
        val p = s"${f.name}_month"
        (df.withColumn(p, (year(col(f.name)) * 100 + month(col(f.name)))
          .cast("int")), Some(p))
      case None => (df, None)
    }
    val w = out.write.mode(mode).format("parquet")
    partCol.fold(w)(p => w.partitionBy(p))
      .saveAsTable(resolveName(db, table, distributed))
    partCol
  }

  /** Read a managed table back (partition column retained — drop it
    * for the logical row shape).
    */
  def readManaged(spark: SparkSession, db: String, table: String): DataFrame =
    spark.table(s"$db.$table")

  /** Bucketed managed write: pre-shuffles once at write time so
    * every later equi-join/aggregation on the bucket key runs
    * WITHOUT an exchange — the co-located-join strategy for tables
    * that are joined repeatedly at 100 TB (pay the shuffle once,
    * not per query). Buckets are also the unit AQE coalesces, so
    * pick counts by target file size, not core count.
    */
  def writeBucketed(df: DataFrame, db: String, table: String,
      bucketCols: Seq[String], numBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    df.sparkSession.sql(DdlBuilder.createDatabase(db))
    df.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(s"$db.$table")
  }
}
