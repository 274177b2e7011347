package graft.schema

import org.apache.spark.sql.types._

/** One row of MySQL `DESC <table>` output — the reference's only
  * intermediate representation (tablesqlbuilder.py:173-213 in
  * /root/reference): (field, type, null, key, default, extra).
  */
final case class ColumnDesc(
    field: String,
    mysqlType: String,
    nullable: Boolean,
    key: String = "",        // "PRI", "UNI", "MUL" or ""
    default: Option[String] = None,
    extra: String = "")

/** Thrown for MySQL types the mapping table doesn't cover. The
  * reference silently emits an 'UNKNOWN' sentinel into generated DDL
  * (tablesqlbuilder.py:348-349) — we fail at analysis time instead.
  */
final class UnknownMySqlTypeException(t: String)
  extends IllegalArgumentException(s"unsupported MySQL type: $t")

/** MySQL type string → Spark `DataType`, the SURVEY.md §1.3 decision
  * table (reference: map_type()/map_type_nullable(),
  * tablesqlbuilder.py:264-368). Strict upgrades vs the reference:
  * exact `DecimalType` instead of stringified DECIMAL, typed
  * `BinaryType` for BIT/BINARY/BLOB, `ArrayType(String)` with member
  * names for SET (reference: Array(Int8)), analysis-time error for
  * unknown types.
  */
object TypeMapper {

  /** `chCompat = true` keeps MySQL TIME as a string (ClickHouse has
    * no interval type and MySQL TIME spans ±838:59:59, beyond
    * time-of-day); otherwise it maps to a day-time interval.
    */
  def map(t: MySqlType, chCompat: Boolean = false): DataType = t.base match {
    case "BIT" => BinaryType
    case "TINYINT" => if (t.unsigned) ShortType else ByteType
    case "BOOL" | "BOOLEAN" => BooleanType
    case "SMALLINT" => if (t.unsigned) IntegerType else ShortType
    case "MEDIUMINT" => IntegerType // fits int32 signed or unsigned
    case "INT" | "INTEGER" => if (t.unsigned) LongType else IntegerType
    case "BIGINT" => if (t.unsigned) DecimalType(20, 0) else LongType
    case "SERIAL" => DecimalType(20, 0) // BIGINT UNSIGNED alias
    case "DECIMAL" | "DEC" | "FIXED" | "NUMERIC" =>
      t.intArgs match {
        case Seq(p, s) => DecimalType(p, s)
        case Seq(p)    => DecimalType(p, 0)
        case _         => DecimalType(10, 0) // MySQL default
      }
    case "FLOAT" => FloatType
    case "DOUBLE" | "REAL" | "DOUBLE PRECISION" => DoubleType
    case "DATETIME" | "TIMESTAMP" => TimestampType
    case "DATE" => DateType
    case "TIME" =>
      if (chCompat) StringType
      else DayTimeIntervalType(DayTimeIntervalType.DAY, DayTimeIntervalType.SECOND)
    case "YEAR" => ShortType
    case "CHAR" | "VARCHAR" | "NCHAR" | "NVARCHAR" => StringType
    case "BINARY" | "VARBINARY" | "TINYBLOB" | "BLOB" | "MEDIUMBLOB" |
         "LONGBLOB" => BinaryType
    case "TINYTEXT" | "TEXT" | "MEDIUMTEXT" | "LONGTEXT" => StringType
    case "ENUM" => StringType
    case "SET" => ArrayType(StringType, containsNull = false)
    case "JSON" => StringType
    case other => throw new UnknownMySqlTypeException(other)
  }

  /** Full `DESC` row → StructField. MySQL-specific facts ride in
    * StructField.metadata (SURVEY §1.2): original type, key flag,
    * default, extra, enum/set members.
    */
  def toField(c: ColumnDesc, chCompat: Boolean = false,
      forceNotNull: Boolean = false): StructField = {
    val t = MySqlType.parse(c.mysqlType)
    val dt = map(t, chCompat)
    val mb = new MetadataBuilder()
      .putString("mysqlType", c.mysqlType)
      .putString("key", c.key)
      .putString("extra", c.extra)
      .putBoolean("unsigned", t.unsigned)
    c.default.foreach(mb.putString("default", _))
    if (t.base == "ENUM" || t.base == "SET")
      mb.putStringArray("members", t.members.toArray)
    // Primary-key / primary-date columns are forced non-nullable
    // (tablesqlbuilder.py:138-142).
    val nullable = c.nullable && !forceNotNull && c.key != "PRI"
    StructField(c.field, dt, nullable, mb.build())
  }

  /** Whole `DESC` output → typed schema, skipping pruned columns
    * (the `--column-skip` surface, tablesqlbuilder.py:199-201).
    */
  def toStructType(cols: Seq[ColumnDesc], skip: Set[String] = Set.empty,
      chCompat: Boolean = false): StructType =
    StructType(cols.filterNot(c => skip(c.field)).map(c => toField(c, chCompat)))
}
