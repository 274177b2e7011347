package graft.migrate

import org.apache.spark.sql.types._

/** Schema-drift detection for re-migration after source DDL changes —
  * the reference's loudest self-declared gap: "DDL changes are not
  * supported" (docs/manual.md:261-262 in /root/reference) and the
  * `freeze_schema` guard that pins the first-seen schema forever
  * (mysqlreader.py:130). Here drift is a first-class, checked
  * evolution instead of a frozen error: ADDITIVE changes (new
  * columns, types widened along the lattice below) evolve the
  * managed table; DESTRUCTIVE changes (dropped columns, narrowed or
  * incompatible types) are rejected loudly — silently losing columns
  * or truncating values on a re-migrate is the one thing a
  * replication tool must never do.
  *
  * The widening lattice is the value-preserving subset of the
  * MySQL-ALTER moves TypeMapper's mapping can produce (TINYINT →
  * SMALLINT → INT → BIGINT, FLOAT → DOUBLE, DECIMAL growth that
  * never loses integer digits or scale): every widened cast is exact
  * for all existing values, so an evolved table hashes identically
  * on the retained rows.
  */
object SchemaDrift {

  /** One detected, legal drift set: `added` columns (absent from the
    * managed table — old rows take NULL), `widened` type moves
    * (colName, from, to).
    */
  final case class Drift(
      added: Seq[StructField],
      widened: Seq[(String, DataType, DataType)]) {
    def isEmpty: Boolean = added.isEmpty && widened.isEmpty
    def describe: Seq[String] =
      added.map(f => s"+${f.name}: ${f.dataType.simpleString}") ++
        widened.map { case (n, from, to) =>
          s"$n: ${from.simpleString} -> ${to.simpleString}" }
  }

  /** Is `from` → `to` a value-preserving widening? Integral chain,
    * float → double, and decimal growth keeping both the integer
    * digits (precision − scale) and the scale are exact for every
    * representable `from` value; integral → decimal/long-enough
    * decimal likewise. Everything else (including long → double,
    * which silently rounds above 2^53) is NOT a widening.
    */
  def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (a: DecimalType, b: DecimalType) =>
      b.scale >= a.scale && (b.precision - b.scale) >= (a.precision - a.scale)
    case (ByteType | ShortType | IntegerType | LongType, b: DecimalType) =>
      val digits = from match {
        case ByteType => 3; case ShortType => 5
        case IntegerType => 10; case _ => 19
      }
      (b.precision - b.scale) >= digits
    case _ => false
  }

  /** Diff the managed table's schema against the drifted source's.
    * Returns the additive evolution to apply; throws
    * IllegalStateException naming every violation when the drift is
    * destructive (dropped columns, narrowing / incompatible type
    * changes) — fail loud, never lose data.
    */
  def diff(existing: StructType, incoming: StructType): Drift = {
    val in = incoming.fields.map(f => f.name -> f).toMap
    val dropped = existing.fields.filterNot(f => in.contains(f.name))
    val narrowed = existing.fields.flatMap { f =>
      in.get(f.name).filterNot(nf => widens(f.dataType, nf.dataType))
        .map(nf => (f.name, f.dataType, nf.dataType))
    }
    val violations =
      dropped.map(f => s"column ${f.name} dropped from the source") ++
        narrowed.map { case (n, from, to) =>
          s"column $n narrowed/incompatible: " +
            s"${from.simpleString} -> ${to.simpleString}" }
    if (violations.nonEmpty)
      throw new IllegalStateException(
        "destructive schema drift refused (re-migrate must never lose " +
          s"data): ${violations.mkString("; ")}")
    val existingNames = existing.fieldNames.toSet
    Drift(
      added = incoming.fields.filterNot(f => existingNames(f.name)).toSeq,
      widened = existing.fields.flatMap { f =>
        val nf = in(f.name)
        if (nf.dataType == f.dataType) None
        else Some((f.name, f.dataType, nf.dataType))
      }.toSeq)
  }
}
