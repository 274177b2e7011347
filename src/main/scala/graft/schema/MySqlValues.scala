package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Value-level parsers for the remaining non-standard MySQL wire
  * shapes (§7.2's decision table, completing [[TimeValues]]):
  *
  *  - SET arrives as a comma-joined member string ('read,write');
  *    TypeMapper maps the TYPE to ArrayType(String) — `setToArray`
  *    produces the VALUE (the reference stores Array(Int8) member
  *    ordinals, tablesqlbuilder.py:329-334 in /root/reference; member
  *    names are the lossless choice);
  *  - BIT(n) arrives as big-endian bytes; `bitToLong` covers n ≤ 63
  *    and `bitToDecimal` the full BIT(64) range (top bit set exceeds
  *    Long — same unsigned-headroom rule as the UInt64 → Decimal(20,0)
  *    type mapping).
  *
  * All pure codegen'd Column expressions.
  */
object MySqlValues {

  /** 'a,b,c' → ["a","b","c"]; '' → [] (an empty SET is no members,
    * not one empty-string member); NULL → NULL.
    */
  def setToArray(s: Column): Column =
    filter(split(s, ","), m => m =!= "")

  /** Big-endian BIT bytes → unsigned value as a decimal(20,0) —
    * exact for the full BIT(64) range.
    */
  def bitToDecimal(b: Column): Column =
    conv(hex(b), 16, 10).cast("decimal(20,0)")

  /** Big-endian BIT bytes → Long, for BIT(n ≤ 63). BIT(64) values
    * with the top bit set exceed Long range — use [[bitToDecimal]]
    * there (ANSI mode makes the overflowing cast fail loudly here
    * rather than wrap).
    */
  def bitToLong(b: Column): Column =
    conv(hex(b), 16, 10).cast("long")
}
