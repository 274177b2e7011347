package graft.schema

import org.scalatest.funsuite.{AnyFunSuite => PropBase}

/** Property-style sweep: the mapper must be total over the
  * reference's documented type grammar with invariants holding for
  * random parameterizations (widths, precisions, unsigned flags).
  */
class TypeMapperPropertySpec extends PropBase {
  import org.apache.spark.sql.types._

  private val rnd = new scala.util.Random(99)
  private val bases = Seq("TINYINT", "SMALLINT", "MEDIUMINT", "INT",
    "INTEGER", "BIGINT", "FLOAT", "DOUBLE", "CHAR", "VARCHAR", "BINARY",
    "VARBINARY", "TEXT", "BLOB", "DATE", "DATETIME", "TIMESTAMP", "YEAR")

  test("mapper is total and unsigned-widening over random grammar samples") {
    for (_ <- 1 to 300) {
      val base = bases(rnd.nextInt(bases.size))
      val width = if (rnd.nextBoolean()) s"(${rnd.nextInt(64) + 1})" else ""
      val unsigned = rnd.nextBoolean() &&
        Seq("TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INTEGER", "BIGINT")
          .contains(base)
      val s = s"$base$width${if (unsigned) " UNSIGNED" else ""}"
      val t = MySqlType.parse(s)
      val dt = TypeMapper.map(t)
      assert(dt != null, s)
      if (unsigned) {
        // unsigned integers map to a strictly wider signed container
        val signedDt = TypeMapper.map(MySqlType.parse(s"$base$width"))
        def bits(d: DataType): Int = d match {
          case ByteType => 8; case ShortType => 16; case IntegerType => 32
          case LongType => 64; case d: DecimalType => 128; case _ => 0
        }
        assert(bits(dt) >= bits(signedDt), s"$s: $signedDt -> $dt")
        if (base != "MEDIUMINT") // 24-bit fits int32 either way
          assert(bits(dt) > bits(signedDt), s"$s must widen")
      }
    }
  }

  test("decimal precision/scale round-trips for random (p, s)") {
    for (_ <- 1 to 100) {
      val p = rnd.nextInt(38) + 1
      val sc = rnd.nextInt(p + 1).min(p)
      val dt = TypeMapper.map(MySqlType.parse(s"DECIMAL($p,$sc)"))
      assert(dt == DecimalType(p, sc))
    }
  }

  test("unknown types fail at analysis time, not silently") {
    intercept[UnknownMySqlTypeException] {
      TypeMapper.map(MySqlType.parse("GEOMETRY"))
    }
  }
}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Type-mapper decision table — every MySQL type from the reference's
  * manual test protocol (docs/manual.md:836-936, FIXTURES.md A1/A2)
  * against the SURVEY §1.3 mapping.
  */
class TypeMapperSpec extends AnyFunSuite {

  val table: Seq[(String, DataType)] = Seq(
    "BIT(1)" -> BinaryType,
    "BIT(64)" -> BinaryType,
    "TINYINT" -> ByteType,
    "TINYINT(3) UNSIGNED" -> ShortType,
    "BOOL" -> BooleanType,
    "BOOLEAN" -> BooleanType,
    "SMALLINT" -> ShortType,
    "SMALLINT(5) UNSIGNED" -> IntegerType,
    "MEDIUMINT" -> IntegerType,
    "MEDIUMINT UNSIGNED" -> IntegerType,
    "INT" -> IntegerType,
    "INTEGER" -> IntegerType,
    "INT(10) UNSIGNED" -> LongType,
    "BIGINT" -> LongType,
    "BIGINT(20) UNSIGNED" -> DecimalType(20, 0),
    "SERIAL" -> DecimalType(20, 0),
    "DECIMAL(3,2)" -> DecimalType(3, 2),
    "DEC(3,2)" -> DecimalType(3, 2),
    "FIXED(3,2)" -> DecimalType(3, 2),
    "NUMERIC(3,2)" -> DecimalType(3, 2),
    "DECIMAL" -> DecimalType(10, 0),
    "DECIMAL(5)" -> DecimalType(5, 0),
    "FLOAT" -> FloatType,
    "FLOAT UNSIGNED" -> FloatType,
    "DOUBLE" -> DoubleType,
    "REAL" -> DoubleType,
    "DOUBLE PRECISION" -> DoubleType,
    "DATE" -> DateType,
    "DATETIME" -> TimestampType,
    "TIMESTAMP" -> TimestampType,
    "YEAR" -> ShortType,
    "CHAR(0)" -> StringType,
    "CHAR(255)" -> StringType,
    "VARCHAR(0)" -> StringType,
    "VARCHAR(65532)" -> StringType,
    "BINARY(0)" -> BinaryType,
    "VARBINARY(65532)" -> BinaryType,
    "TINYBLOB" -> BinaryType,
    "BLOB" -> BinaryType,
    "MEDIUMBLOB" -> BinaryType,
    "LONGBLOB" -> BinaryType,
    "TINYTEXT" -> StringType,
    "TEXT" -> StringType,
    "MEDIUMTEXT" -> StringType,
    "LONGTEXT" -> StringType,
    "ENUM('a','b','c','d','e','f')" -> StringType,
    "SET('a','b','c','d','e','f')" -> ArrayType(StringType, containsNull = false),
    "JSON" -> StringType,
  )

  table.foreach { case (mysql, expected) =>
    test(s"$mysql -> $expected") {
      assert(TypeMapper.map(MySqlType.parse(mysql)) == expected)
    }
  }

  test("TIME maps to interval, or String in ClickHouse-compat mode") {
    assert(TypeMapper.map(MySqlType.parse("TIME")) ==
      DayTimeIntervalType(DayTimeIntervalType.DAY, DayTimeIntervalType.SECOND))
    assert(TypeMapper.map(MySqlType.parse("TIME"), chCompat = true) == StringType)
  }

  test("unknown type raises at analysis time (not a silent UNKNOWN)") {
    intercept[UnknownMySqlTypeException] {
      TypeMapper.map(MySqlType.parse("GEOMETRY"))
    }
  }

  test("parser: unsigned + zerofill + display width") {
    val t = MySqlType.parse("int(10) unsigned zerofill")
    assert(t.base == "INT" && t.unsigned && t.zerofill && t.intArgs == Seq(10))
  }

  test("parser: enum members incl. comma and escaped quote") {
    val t = MySqlType.parse("ENUM('a,b','it''s','c')")
    assert(t.members == Seq("a,b", "it''s", "c"))
  }

  test("UInt64 max value 18446744073709551615 fits DecimalType(20,0)") {
    val dt = TypeMapper.map(MySqlType.parse("BIGINT UNSIGNED"))
      .asInstanceOf[DecimalType]
    val v = BigDecimal("18446744073709551615")
    assert(v.precision <= dt.precision && dt.scale == 0)
  }

  test("PRI column forced non-nullable; metadata carried") {
    val f = TypeMapper.toField(
      ColumnDesc("id", "INT(11)", nullable = true, key = "PRI",
        default = Some("0"), extra = "auto_increment"))
    assert(!f.nullable)
    assert(f.metadata.getString("mysqlType") == "INT(11)")
    assert(f.metadata.getString("key") == "PRI")
    assert(f.metadata.getString("default") == "0")
    assert(f.metadata.getString("extra") == "auto_increment")
  }

  test("toStructType honors column skip") {
    val st = TypeMapper.toStructType(Seq(
      ColumnDesc("a", "INT", nullable = true),
      ColumnDesc("b", "TEXT", nullable = true)), skip = Set("b"))
    assert(st.fieldNames.toSeq == Seq("a"))
  }
}

class DdlBuilderSpec extends AnyFunSuite {

  val schema: StructType = TypeMapper.toStructType(Seq(
    ColumnDesc("id", "INT(11)", nullable = false, key = "PRI"),
    ColumnDesc("day", "DATE", nullable = true),
    ColumnDesc("amount", "DECIMAL(10,2)", nullable = true),
    ColumnDesc("note", "VARCHAR(255)", nullable = true),
    ColumnDesc("big", "BIGINT UNSIGNED", nullable = true)))

  test("primary date field = first DATE/DATETIME column") {
    assert(DdlBuilder.primaryDateField(schema).map(_.name).contains("day"))
  }

  test("primary key fields from DESC key flags") {
    assert(DdlBuilder.primaryKeyFields(schema).map(_.name) == Seq("id"))
  }

  test("spark DDL: parquet + month partition + NOT NULL pk") {
    val ddl = DdlBuilder.createTableSpark("db1", "t1", schema)
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS `db1`.`t1`"))
    assert(ddl.contains("USING PARQUET"))
    assert(ddl.contains("PARTITIONED BY (`day_month`)"))
    assert(ddl.contains("`id` INT NOT NULL"))
    assert(ddl.contains("`amount` DECIMAL(10,2)"))
  }

  test("clickhouse DDL: ReplacingMergeTree + toYYYYMM + ORDER BY pk") {
    val ddl = DdlBuilder.createTableClickHouse("db1", "t1", schema)
    assert(ddl.contains("ENGINE = ReplacingMergeTree()"))
    assert(ddl.contains("PARTITION BY toYYYYMM(`day`)"))
    assert(ddl.contains("ORDER BY (`id`)"))
    assert(ddl.contains("`id` Int32"))          // PRI: non-nullable
    // partition key must not be Nullable even when the source column
    // is (tablesqlbuilder.py:139-142; CH rejects nullable keys)
    assert(ddl.contains("`day` Date"))
    assert(!ddl.contains("`day` Nullable"))
    assert(ddl.contains("`big` Nullable(UInt64)"))
  }

  test("clickhouse DDL: no-PK table falls back to non-nullable date ORDER BY") {
    val s = TypeMapper.toStructType(Seq(
      ColumnDesc("day", "DATE", nullable = true),
      ColumnDesc("v", "INT", nullable = true)))
    val ddl = DdlBuilder.createTableClickHouse("db1", "t2", s)
    assert(ddl.contains("ORDER BY (`day`)"))
    assert(ddl.contains("`day` Date")) // sorting key: never Nullable
    assert(!ddl.contains("`day` Nullable"))
  }

  test("clickhouse DDL: unsigned width disambiguation via mysqlType metadata") {
    val s = TypeMapper.toStructType(Seq(
      ColumnDesc("sm", "SMALLINT UNSIGNED", nullable = false),
      ColumnDesc("md", "MEDIUMINT UNSIGNED", nullable = false)))
    val ddl = DdlBuilder.createTableClickHouse("db1", "t3", s)
    // both are Spark IntegerType, but CH widths differ
    // (tablesqlbuilder.py:283-286): 0..65535 vs 0..16777215
    assert(ddl.contains("`sm` UInt16"))
    assert(ddl.contains("`md` UInt32"))
  }

  test("distributed DDL + naming") {
    assert(DdlBuilder.distributedName("db", "t") == "db__t_all")
    val ddl = DdlBuilder.createTableDistributed("db", "t", "c1", schema)
    assert(ddl.contains("ENGINE = Distributed(c1, db, t, rand())"))
  }

  test("template DDL keeps placeholders for manual editing") {
    val ddl = DdlBuilder.createTableTemplate("db", "t", schema)
    assert(ddl.contains("<PRIMARY_DATE_FIELD>"))
    assert(ddl.contains("<PRIMARY_KEY_FIELDS>"))
  }

  test("schema JSON round-trips") {
    val json = DdlBuilder.schemaJson(schema)
    assert(DataType.fromJson(json) == schema)
  }

  test("create database") {
    assert(DdlBuilder.createDatabase("x") == "CREATE DATABASE IF NOT EXISTS `x`")
  }
}

/** MySQL TIME value parsing (manual.md:807-825 range, boundary rows
  * from manual.md:944-1142): ±838:59:59 clamp, microsecond
  * fractions, malformed → NULL.
  */
class TimeValuesSpec extends PropBase {
  import org.apache.spark.sql.functions._
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  /** Exact interval equality against independently-built expected
    * seconds (interval cannot cast to double; equality is exact).
    */
  private def parsesTo(s: String, secs: BigDecimal): Boolean =
    Seq(s).toDF("t").select(
      (TimeValues.parseTime(col("t")) <=> make_dt_interval(
        lit(0), lit(0), lit(0), lit(secs).cast("decimal(18,6)"))).as("ok"))
      .head().getBoolean(0)

  private def parsesNull(s: String): Boolean =
    Seq(s).toDF("t").select(TimeValues.parseTime(col("t")).isNull).head().getBoolean(0)

  test("boundary values parse to the exact MySQL range limits") {
    assert(parsesTo("838:59:59", BigDecimal(3020399)))
    assert(parsesTo("-838:59:59", BigDecimal(-3020399)))
    assert(parsesTo("00:00:00", BigDecimal(0)))
  }

  test("out-of-range values clamp to the boundary like MySQL") {
    assert(parsesTo("900:00:00", BigDecimal(3020399)))
    assert(parsesTo("-999:59:59", BigDecimal(-3020399)))
  }

  test("fractional seconds survive exactly (decimal, not double)") {
    assert(parsesTo("12:34:56.5", BigDecimal(12 * 3600 + 34 * 60 + 56) + BigDecimal("0.5")))
    assert(parsesTo("-00:00:00.000001", BigDecimal("-0.000001")))
  }

  test("malformed strings yield NULL") {
    for (bad <- Seq("abc", "12:99:00", "12:00:99", "1:2", "", "12-00-00"))
      assert(parsesNull(bad), s"'$bad' must not parse")
  }

  test("randomized H:M:S round-trip against independent arithmetic") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(200) {
      val h = rnd.nextInt(839); val m = rnd.nextInt(60); val s = rnd.nextInt(60)
      val neg = rnd.nextBoolean()
      (f"${if (neg) "-" else ""}$h%d:$m%02d:$s%02d",
        (if (neg) -1L else 1L) * (h * 3600L + m * 60 + s))
    }
    val df = cases.toDF("t", "expected")
    val wrong = df.select(
        TimeValues.parseTime(col("t")).cast("long").as("got"), col("expected"))
      .filter(col("got") =!= col("expected") || col("got").isNull)
    assert(wrong.isEmpty, "every generated TIME must parse to its seconds")
    // and the string renderer inverts the parse at whole-second precision
    val badFmt = df.select(col("t"),
        TimeValues.formatTime(TimeValues.parseTime(col("t"))).as("f"))
      .filter(regexp_replace(col("t"), "^(-?)0*(\\d)", "$1$2") =!= col("f"))
    assert(badFmt.isEmpty, "formatTime must invert parseTime")
  }
}

/** MySQL SET / BIT value parsing (§7.2 decision table). */
class MySqlValuesSpec extends PropBase {
  import org.apache.spark.sql.functions._
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._
  import graft.schema.MySqlValues

  test("SET strings split to member arrays; empty set is no members") {
    val r = Seq("read,write", "", "admin").toDF("s")
      .select(MySqlValues.setToArray(col("s"))).collect()
      .map(_.getSeq[String](0))
    assert(r(0) == Seq("read", "write"))
    assert(r(1).isEmpty)
    assert(r(2) == Seq("admin"))
  }

  test("BIT bytes parse big-endian; BIT(64) high-bit needs decimal") {
    val rows = Seq(
      Array[Byte](0x05),                      // 5
      Array[Byte](0x01, 0x00),                // 256
      Array[Byte](0x7f, -1, -1, -1, -1, -1, -1, -1)) // Long.MaxValue
      .toDF("b")
    val longs = rows.select(MySqlValues.bitToLong(col("b"))).collect()
      .map(_.getLong(0))
    assert(longs.toSeq == Seq(5L, 256L, Long.MaxValue))
    // 0xFFFF_FFFF_FFFF_FFFF = 2^64 - 1: beyond Long, exact in decimal
    val big = Seq(Array.fill[Byte](8)(-1)).toDF("b")
      .select(MySqlValues.bitToDecimal(col("b"))).head().getDecimal(0)
    assert(big.toString == "18446744073709551615")
  }
}
