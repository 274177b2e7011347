package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tagged character n-grams for chrF
  * ([[graft.text.GenerationEval.chrF]]): ALL orders 1..maxOrder of
  * the space-stripped input in ONE native pass, each gram as the
  * `(n, nc, nr, g)` struct the metric's tagged-explode plan consumes.
  *
  * A native expression for the same reason as [[Shingles]]: the
  * higher-order form (per order: `filter(transform(sequence(...)))`,
  * then a struct-tagging `transform`, then a 13-array `concat`)
  * interprets ~5 Catalyst nodes per gram and re-walks the string per
  * order — measured 17 s vs ~6 s for the whole q164 at sf0.1. This
  * walks the UTF-8 bytes once (space stripping is a byte filter:
  * 0x20 never occurs inside a multi-byte sequence), records char
  * boundaries once, and emits every order's grams from the same
  * buffer.
  */
object CharGramTags {
  def tags(s: Column, maxOrder: Int, cand: Boolean): Column =
    B.column(CharGramTags(B.expression(s), maxOrder, cand))

  val ElementType: StructType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("nc", LongType, nullable = false),
    StructField("nr", LongType, nullable = false),
    StructField("g", StringType, nullable = false)))

  def compute(s: UTF8String, maxOrder: Int, cand: Boolean): ArrayData = {
    val raw = s.getBytes
    // strip spaces (the chrF convention) byte-wise
    var nb = 0
    var i = 0
    while (i < raw.length) { if (raw(i) != ' ') nb += 1; i += 1 }
    val bytes = if (nb == raw.length) raw else {
      val b = new Array[Byte](nb)
      var j = 0; i = 0
      while (i < raw.length) { if (raw(i) != ' ') { b(j) = raw(i); j += 1 }; i += 1 }
      b
    }
    // char boundaries: a UTF-8 char starts wherever (b & 0xC0) != 0x80
    var chars = 0
    i = 0
    while (i < bytes.length) { if ((bytes(i) & 0xC0) != 0x80) chars += 1; i += 1 }
    val starts = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(chars) = bytes.length
    val nc = if (cand) 1L else 0L
    val nr = if (cand) 0L else 1L
    var total = 0
    var n = 1
    while (n <= maxOrder) { if (chars >= n) total += chars - n + 1; n += 1 }
    val out = new Array[Any](total)
    var t = 0
    n = 1
    while (n <= maxOrder) {
      var p = 0
      while (p + n <= chars) {
        val g = UTF8String.fromBytes(bytes, starts(p), starts(p + n) - starts(p))
        out(t) = new GenericInternalRow(
          Array[Any](n, nc, nr, g)): InternalRow
        t += 1
        p += 1
      }
      n += 1
    }
    new GenericArrayData(out)
  }
}

case class CharGramTags(child: Expression, maxOrder: Int, cand: Boolean)
    extends UnaryExpression {
  require(maxOrder >= 1 && maxOrder <= 8,
    s"maxOrder must be in [1,8]: $maxOrder")

  override def dataType: DataType =
    ArrayType(CharGramTags.ElementType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chargramtags requires a STRING argument, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharGramTags.compute(input.asInstanceOf[UTF8String], maxOrder, cand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharGramTags$$.MODULE$$" +
        s".compute($c, $maxOrder, $cand);")

  override protected def withNewChildInternal(newChild: Expression): CharGramTags =
    copy(child = newChild)
}
