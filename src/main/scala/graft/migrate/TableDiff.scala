package graft.migrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level snapshot reconciliation — the upgrade of the migration
  * chain's COUNT(*) check (Migrator's reconciliation protocol;
  * reference behavior: the manual's post-migrate count comparison,
  * docs/manual.md): not just "how many rows differ" but WHICH rows
  * and WHICH columns, keyed on the primary key.
  *
  * Scale shape: one full outer join on the PK (both sides shuffle
  * once on the same key) with per-row column comparison inside the
  * join — output is diff-sized, never snapshot-sized. Null-safe
  * equality (`<=>`) so NULL→value and value→NULL both count as
  * changes.
  */
object TableDiff {

  /** Diff `after` against `before` keyed on `pk`: one row per
    * added / removed / changed key with the comma-joined sorted list
    * of changed columns ('' for added/removed). Unchanged rows are
    * absent — the output is the reconciliation report, not a copy.
    */
  def diff(before: DataFrame, after: DataFrame, pk: Seq[String]): DataFrame = {
    require(pk.nonEmpty, "diff needs at least one PK column")
    val cols = after.columns.filterNot(pk.contains)
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schema mismatch: ${before.columns.mkString(",")} vs " +
        s"${after.columns.mkString(",")}")
    val b = before.select(before.columns.map(c => col(c).as(s"b_$c")): _*)
    val a = after.select(after.columns.map(c => col(c).as(s"a_$c")): _*)
    val joinCond = pk.map(k => col(s"b_$k") === col(s"a_$k"))
      .reduce(_ && _)
    val bKey = col(s"b_${pk.head}")
    val aKey = col(s"a_${pk.head}")
    val anyChange = cols.map(c => !(col(s"b_$c") <=> col(s"a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val status = when(bKey.isNull, "added")
      .when(aKey.isNull, "removed")
      .otherwise("changed")
    // sorted column order keeps the report deterministic
    val changedCols = concat_ws(",", cols.sorted.map(c =>
      when(!(col(s"b_$c") <=> col(s"a_$c")), lit(c))): _*)
    b.join(a, joinCond, "full_outer")
      .filter(bKey.isNull || aKey.isNull || anyChange)
      .select(
        pk.map(k => coalesce(col(s"b_$k"), col(s"a_$k")).as(k)) ++ Seq(
          status.as("status"),
          when(status === "changed", changedCols).otherwise(lit(""))
            .as("changed_cols")): _*)
  }
}
