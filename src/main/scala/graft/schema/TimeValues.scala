package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MySQL TIME *value* parsing — the value-level counterpart of
  * TypeMapper's TIME → day-time-interval type mapping. MySQL TIME is
  * an elapsed-time/interval type spanning '-838:59:59' to
  * '838:59:59' (docs/manual.md:807-825 and the boundary-value test
  * tables at manual.md:944-1142 in /root/reference) — beyond any
  * time-of-day type, so graft lands it in Spark's
  * `DayTimeIntervalType(DAY, SECOND)`.
  *
  * Pure Column expression (regexp + decimal arithmetic +
  * `make_dt_interval`) — codegen'd, no UDF, one pass per value.
  */
object TimeValues {

  /** Seconds in MySQL's TIME range boundary, 838:59:59. */
  val MaxSeconds: Long = 838L * 3600 + 59 * 60 + 59 // 3020399

  private val TimeRe = "^([+-]?)(\\d{1,3}):([0-5]?\\d):([0-5]?\\d(?:\\.\\d{1,6})?)$"

  /** Parse a MySQL TIME string ('[-]HHH:MM:SS[.ffffff]') into a
    * day-time interval.
    *
    *  - Range follows MySQL: values beyond ±838:59:59 CLAMP to the
    *    boundary (MySQL stores the clipped value, it does not error);
    *  - fractional seconds up to microseconds are preserved exactly
    *    (decimal arithmetic, not double);
    *  - malformed strings (minutes/seconds > 59, not H:M:S shape)
    *    yield NULL, the SQL conversion convention.
    */
  def parseTime(s: Column): Column = {
    val sign = when(regexp_extract(s, TimeRe, 1) === "-", lit(-1)).otherwise(lit(1))
    val h = regexp_extract(s, TimeRe, 2).cast("long")
    val m = regexp_extract(s, TimeRe, 3).cast("long")
    val sec = regexp_extract(s, TimeRe, 4).cast("decimal(16,6)")
    val total = (h * 3600 + m * 60).cast("decimal(16,6)") + sec
    val clamped = least(total, lit(MaxSeconds).cast("decimal(16,6)"))
    // the rlike guard keeps the casts unevaluated for non-matching
    // rows (CaseWhen branches are lazy) — under ANSI mode the cast of
    // regexp_extract's "" no-match result would throw, not null out
    when(s.rlike(TimeRe), make_dt_interval(lit(0), lit(0), lit(0),
      (sign * clamped).cast("decimal(18,6)")))
  }

  /** Render a day-time interval back to the MySQL TIME string shape
    * ('-838:59:59') at whole-second precision, for
    * CSV/ClickHouse-compatible string sinks (TypeMapper's `chCompat`
    * keeps TIME as String). Interval → long is total whole seconds.
    */
  def formatTime(iv: Column): Column = {
    val totalSecs = iv.cast("long")
    val secs = abs(totalSecs)
    val sign = when(totalSecs < 0, lit("-")).otherwise(lit(""))
    concat(sign, format_string("%d:%02d:%02d",
      floor(secs / 3600).cast("long"),
      floor((secs % 3600) / 60).cast("long"), secs % 60))
  }
}
