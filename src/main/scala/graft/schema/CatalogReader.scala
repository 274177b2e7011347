package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Catalog introspection producing `ColumnDesc` rows (SURVEY §2.1
  * S4) — the Spark-side replacement for the reference's
  * `SHOW TABLES` + `DESC` loop (tableprocessor.py:63-144,
  * dbclient/mysqlclient.py:87-121 in /root/reference).
  *
  * Input is any DataFrame in INFORMATION_SCHEMA.COLUMNS shape
  * (table_name, ordinal_position, column_name, column_type,
  * is_nullable, column_key, column_default, extra) — in production
  * `spark.read.jdbc` against the live INFORMATION_SCHEMA; in tests a
  * CSV fixture. Catalog metadata is inherently driver-sized (it
  * configures jobs, it is not data), so materializing it with
  * `collect()` here is correct — thousands of tables are kilobytes.
  */
object CatalogReader {

  val CatalogSchema: StructType = StructType.fromDDL(
    "table_name STRING, ordinal_position INT, column_name STRING, " +
      "column_type STRING, is_nullable STRING, column_key STRING, " +
      "column_default STRING, extra STRING")

  /** Parse an INFORMATION_SCHEMA.COLUMNS-shaped frame into per-table
    * `ColumnDesc` lists, columns in ordinal order.
    */
  def fromDataFrame(catalog: DataFrame): Map[String, Seq[ColumnDesc]] =
    catalog
      .select(col("table_name"), col("ordinal_position"), col("column_name"),
        col("column_type"), col("is_nullable"), col("column_key"),
        col("column_default"), col("extra"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (table, rows) =>
        table -> rows.sortBy(_.getInt(1)).toSeq.map { r =>
          ColumnDesc(
            field = r.getString(2),
            mysqlType = r.getString(3),
            nullable = r.getString(4).equalsIgnoreCase("YES"),
            key = Option(r.getString(5)).getOrElse(""),
            default = Option(r.getString(6)),
            extra = Option(r.getString(7)).getOrElse(""))
        }
      }

  /** CSV fixture convenience (tests / offline runs). */
  def fromCsv(spark: SparkSession, path: String): Map[String, Seq[ColumnDesc]] =
    fromDataFrame(spark.read.option("header", true).schema(CatalogSchema)
      .csv(path))

  /** Work-list resolution: the UNION of explicitly named tables and
    * prefix expansion against the discovered table list —
    * `--src-tables` + `--src-tables-prefixes`
    * (tableprocessor.py:118-144). Returned in name order
    * (deterministic); an explicitly named table missing from the
    * catalog is an error, not a silent no-op.
    */
  def resolveTables(catalog: Map[String, Seq[ColumnDesc]],
      tables: Seq[String] = Nil, prefixes: Seq[String] = Nil): Seq[String] = {
    val unknown = tables.filterNot(catalog.contains)
    require(unknown.isEmpty,
      s"tables not in catalog: ${unknown.mkString(", ")}")
    val known = catalog.keys.toSeq.sorted
    val picked = known.filter(t =>
      tables.contains(t) || prefixes.exists(t.startsWith))
    if (tables.isEmpty && prefixes.isEmpty) known else picked
  }

  /** Typed schema for one table (column skip applied) — the
    * DESC → StructType bridge into TypeMapper.
    */
  def schemaOf(catalog: Map[String, Seq[ColumnDesc]], table: String,
      skip: Set[String] = Set.empty, chCompat: Boolean = false): StructType =
    TypeMapper.toStructType(
      catalog.getOrElse(table,
        throw new NoSuchElementException(s"table not in catalog: $table")),
      skip, chCompat)
}
