package graft.schema

import org.apache.spark.sql.types._

/** DDL generation (SURVEY.md §2.12; reference:
  * tablesqlbuilder.py:78-171, 215-240, 370-398 in /root/reference).
  *
  * Two dialects from one `StructType`:
  *  - Spark SQL DDL (`USING PARQUET PARTITIONED BY`), the native
  *    target for this engine;
  *  - ClickHouse-compatible DDL (ReplacingMergeTree / Distributed),
  *    byte-shape-compatible with what the reference emits, so a user
  *    migrating off it can diff the output.
  */
object DdlBuilder {

  /** Backtick-quoted `db`.`table` (tableprocessor.py:146-213). */
  def fullName(db: String, table: String): String = s"`$db`.`$table`"

  /** Distributed-table naming: `db__table_all` (chwriter.py:35-38). */
  def distributedName(db: String, table: String): String =
    s"${db}__${table}_all"

  /** First DATE/DATETIME column drives partitioning — the
    * reference's primary-date rule (tablesqlbuilder.py:215-227).
    * Matches both timestamp flavors (parquet files without
    * isAdjustedToUTC surface as TIMESTAMP_NTZ in Spark 4).
    */
  def primaryDateField(schema: StructType): Option[StructField] =
    schema.fields.find(f =>
      f.dataType == DateType || f.dataType == TimestampType ||
        f.dataType == TimestampNTZType)

  /** PK columns from DESC key flags (tablesqlbuilder.py:229-240). */
  def primaryKeyFields(schema: StructType): Seq[StructField] =
    schema.fields.toIndexedSeq.filter(f =>
      f.metadata.contains("key") && f.metadata.getString("key") == "PRI")

  private def sparkColDdl(f: StructField): String = {
    val n = if (f.nullable) "" else " NOT NULL"
    s"  `${f.name}` ${f.dataType.sql}$n"
  }

  /** CREATE DATABASE (tablesqlbuilder.py:161-171). */
  def createDatabase(db: String): String =
    s"CREATE DATABASE IF NOT EXISTS `$db`"

  /** Spark-native CREATE TABLE: parquet-backed, partitioned by the
    * month of the primary date column (a derived partition column —
    * at 100 TB month-partitioning keeps file counts sane while
    * enabling partition pruning on date predicates).
    */
  def createTableSpark(db: String, table: String, schema: StructType): String = {
    val dateCol = primaryDateField(schema)
    val partCol = dateCol.map(f => s"`${f.name}_month` INT")
    val cols = schema.fields.map(sparkColDdl) ++
      partCol.map(c => s"  $c")
    val partClause = dateCol
      .map(f => s"\nPARTITIONED BY (`${f.name}_month`)")
      .getOrElse("")
    s"""CREATE TABLE IF NOT EXISTS ${fullName(db, table)} (
       |${cols.mkString(",\n")}
       |) USING PARQUET$partClause""".stripMargin
  }

  /** Original MySQL base type (from DESC), carried in metadata by
    * TypeMapper.toField — needed because several MySQL types collapse
    * to one Spark type (e.g. SMALLINT UNSIGNED and MEDIUMINT UNSIGNED
    * are both IntegerType) but render as different ClickHouse widths
    * (tablesqlbuilder.py:283-286: UInt16 vs UInt32).
    */
  private def mysqlBase(f: StructField): String =
    if (f.metadata.contains("mysqlType"))
      MySqlType.parse(f.metadata.getString("mysqlType")).base
    else ""

  private def chType(f: StructField, forceNotNull: Boolean = false): String = {
    val base = f.dataType match {
      case ByteType => "Int8"
      case ShortType => if (meta(f, "unsigned")) "UInt8" else "Int16"
      case IntegerType if meta(f, "unsigned") =>
        // SMALLINT UNSIGNED (0..65535) → UInt16; MEDIUMINT UNSIGNED
        // (0..16777215) overflows UInt16 → UInt32
        // (tablesqlbuilder.py:283-286).
        if (mysqlBase(f) == "MEDIUMINT") "UInt32" else "UInt16"
      case IntegerType => "Int32"
      case LongType => if (meta(f, "unsigned")) "UInt32" else "Int64"
      case d: DecimalType if d.precision == 20 && d.scale == 0 => "UInt64"
      case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
      case FloatType => "Float32"
      case DoubleType => "Float64"
      case BooleanType => "UInt8"
      case DateType => "Date"
      case TimestampType | TimestampNTZType => "DateTime"
      case BinaryType | StringType => "String"
      case ArrayType(StringType, _) => "Array(String)"
      case other => other.sql
    }
    if (f.nullable && !forceNotNull) s"Nullable($base)" else base
  }

  private def meta(f: StructField, key: String): Boolean =
    f.metadata.contains(key) && f.metadata.getBoolean(key)

  /** ClickHouse-compatible ready-to-run DDL mirroring the reference's
    * generated shape (ReplacingMergeTree, PARTITION BY toYYYYMM,
    * ORDER BY primary keys — tablesqlbuilder.py:108-159, 370-384).
    */
  def createTableClickHouse(db: String, table: String,
      schema: StructType): String = {
    val dateCol = primaryDateField(schema)
    val pks = primaryKeyFields(schema)
    // ClickHouse rejects Nullable sorting/partition keys: every
    // ORDER BY column and the primary-date (PARTITION BY) column are
    // forced non-nullable, mirroring the reference
    // (tablesqlbuilder.py:139-142).
    val orderByNames: Set[String] =
      (if (pks.nonEmpty) pks.map(_.name).toSet
       else dateCol.map(_.name).toSet) ++ dateCol.map(_.name)
    val cols = schema.fields.map(f =>
      s"  `${f.name}` ${chType(f, forceNotNull = orderByNames(f.name))}")
    val orderBy =
      if (pks.nonEmpty) pks.map(f => s"`${f.name}`").mkString(", ")
      else dateCol.map(f => s"`${f.name}`").getOrElse("tuple()")
    val partition = dateCol
      .map(f => s"\nPARTITION BY toYYYYMM(`${f.name}`)").getOrElse("")
    s"""CREATE TABLE IF NOT EXISTS ${fullName(db, table)} (
       |${cols.mkString(",\n")}
       |) ENGINE = ReplacingMergeTree()$partition
       |ORDER BY ($orderBy)""".stripMargin
  }

  /** Distributed-engine DDL (tablesqlbuilder.py:386-391): shards by
    * rand() across a cluster — in Spark terms a round-robin
    * repartition, kept only for DDL-output parity.
    */
  def createTableDistributed(db: String, table: String, cluster: String,
      schema: StructType): String = {
    val cols = schema.fields.map(f => s"  `${f.name}` ${chType(f)}")
    s"""CREATE TABLE IF NOT EXISTS `$db`.`${distributedName(db, table)}` (
       |${cols.mkString(",\n")}
       |) ENGINE = Distributed($cluster, $db, $table, rand())""".stripMargin
  }

  /** Template variant with placeholders for manual editing —
    * the reference's `--create-table-sql-template`
    * (tablesqlbuilder.py:78-106).
    */
  def createTableTemplate(db: String, table: String,
      schema: StructType): String = {
    val cols = schema.fields.map(f => s"  `${f.name}` ${chType(f)}")
    s"""CREATE TABLE IF NOT EXISTS ${fullName(db, table)} (
       |${cols.mkString(",\n")}
       |) ENGINE = ReplacingMergeTree()
       |PARTITION BY toYYYYMM(<PRIMARY_DATE_FIELD>)
       |ORDER BY (<PRIMARY_KEY_FIELDS>)""".stripMargin
  }

  /** JSON schema output "for IPC" (main.py:109-112) — `StructType`
    * already serializes losslessly.
    */
  def schemaJson(schema: StructType): String = schema.json
}
