package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object Shingles {
  def shingles(text: Column, k: Int): Column =
    B.column(Shingles(B.expression(text), k))

  /** Tokenize UTF-8 bytes on ASCII-whitespace runs, then emit every
    * consecutive k-gram joined with a single space. One pass, one
    * allocation per shingle.
    */
  private[functions] def compute(s: UTF8String, k: Int): GenericArrayData = {
    val bytes = s.getBytes
    // token boundaries [start, end) over whitespace runs
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        starts.add(i)
        while (i < n && !isWs(bytes(i))) i += 1
        ends.add(i)
      }
    }
    val nTok = starts.size()
    if (nTok < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTok - k + 1)
    var t = 0
    while (t <= nTok - k) {
      var len = k - 1 // separating single spaces
      var j = t
      while (j < t + k) { len += ends.get(j) - starts.get(j); j += 1 }
      val buf = new Array[Byte](len)
      var pos = 0
      j = t
      while (j < t + k) {
        val l = ends.get(j) - starts.get(j)
        System.arraycopy(bytes, starts.get(j), buf, pos, l)
        pos += l
        if (j < t + k - 1) { buf(pos) = ' '; pos += 1 }
        j += 1
      }
      out(t) = UTF8String.fromBytes(buf)
      t += 1
    }
    new GenericArrayData(out)
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'
}

/** Consecutive k-token shingles of a whitespace-tokenized string —
  * the native form of
  * `transform(sequence(...), i => concat_ws(" ", slice(tokens, ...)))`.
  * The HOF form re-evaluates the `split` regex inside the lambda for
  * every element (O(tokens) full-text splits per row); this
  * expression tokenizes once per row.
  */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles requires a STRING argument, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Shingles$$.MODULE$$.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}
