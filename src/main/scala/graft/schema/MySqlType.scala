package graft.schema

/** Parsed MySQL column type, e.g. `INT(10) UNSIGNED`, `DECIMAL(3,2)`,
  * `ENUM('a','b')`, `SET('x','y')`, `VARCHAR(255)`.
  *
  * The reference never parses types into a structure — `map_type()`
  * does `startswith` matching on the raw string
  * (tablesqlbuilder.py:264-351 in /root/reference). A parsed ADT
  * makes unsigned detection and argument extraction explicit and
  * testable.
  */
final case class MySqlType(
    base: String,            // upper-cased base name, e.g. "INT"
    args: Seq[String],       // display width / (p,s) / enum values
    unsigned: Boolean,
    zerofill: Boolean,
    raw: String) {
  def intArgs: Seq[Int] = args.flatMap(_.trim.toIntOption)
  /** Enum/set member list with SQL quotes stripped. */
  def members: Seq[String] =
    args.map(_.trim.stripPrefix("'").stripSuffix("'"))
}

object MySqlType {
  private val TypeRe =
    """(?i)^\s*([a-z0-9_ ]+?)\s*(?:\((.*)\))?\s*((?:\s*(?:unsigned|signed|zerofill))*)\s*$""".r

  /** Split the argument list on commas not inside quotes (enum
    * members may contain commas).
    */
  private def splitArgs(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      ch match {
        case '\'' =>
          // '' inside a quoted member is an escaped quote
          if (inQuote && i + 1 < s.length && s.charAt(i + 1) == '\'') {
            cur += '\''; i += 1
          } else inQuote = !inQuote
          cur += '\''
        case ',' if !inQuote => out += cur.result(); cur.clear()
        case c => cur += c
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }

  def parse(raw: String): MySqlType = raw match {
    case TypeRe(base, args, mods) =>
      val m = Option(mods).map(_.toLowerCase).getOrElse("")
      MySqlType(
        base = base.trim.toUpperCase.replaceAll("\\s+", " "),
        args = Option(args).map(splitArgs).getOrElse(Nil),
        unsigned = m.contains("unsigned"),
        zerofill = m.contains("zerofill"),
        raw = raw)
    case _ =>
      MySqlType(raw.trim.toUpperCase, Nil, unsigned = false,
        zerofill = false, raw = raw)
  }
}
