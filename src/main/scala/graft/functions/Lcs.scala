package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge => B}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence length over token arrays — the ROUGE-L
  * kernel ([[graft.text.GenerationEval.rougeL]]).
  *
  * A native expression for the same reason as [[QuantDot]]: the
  * rolling-row DP is O(m·n) PER PAIR, and a higher-order-function
  * formulation would interpret one Catalyst node per DP cell and
  * allocate a row array per fold step — at millions of pairs that is
  * billions of node evaluations. This compiles to a tight int-array
  * loop inside whole-stage codegen (interpreted `nullSafeEval`
  * mirror for constant folding), memory O(min-side) via the rolling
  * row.
  */
object Lcs {
  def lcsLength(a: Column, b: Column): Column =
    B.column(LcsLength(B.expression(a), B.expression(b)))
}

/** `LCS(a, b)` over two `ARRAY<STRING>` columns, as a BIGINT. Null
  * arrays propagate null (BinaryExpression contract); null ELEMENTS
  * match nothing (a null token is not equal to anything, including
  * another null — the SQL equality stance).
  */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lcs requires two ARRAY<STRING> arguments, got ${l.sql}, ${r.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val m = x.numElements()
    val n = y.numElements()
    val dp = new Array[Int](n + 1)
    var i = 0
    while (i < m) {
      val ci: UTF8String = if (x.isNullAt(i)) null else x.getUTF8String(i)
      var prev = 0 // dp_old[j-1], the diagonal
      var j = 1
      while (j <= n) {
        val tmp = dp(j)
        if (ci != null && !y.isNullAt(j - 1) &&
            ci.equals(y.getUTF8String(j - 1)))
          dp(j) = prev + 1
        else if (dp(j - 1) > dp(j)) dp(j) = dp(j - 1)
        prev = tmp
        j += 1
      }
      i += 1
    }
    dp(n).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val dp = ctx.freshName("dp")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ci = ctx.freshName("ci")
      val prev = ctx.freshName("prev")
      val tmp = ctx.freshName("tmp")
      s"""
         |int $m = $a.numElements();
         |int $n = $b.numElements();
         |int[] $dp = new int[$n + 1];
         |for (int $i = 0; $i < $m; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $ci =
         |    $a.isNullAt($i) ? null : $a.getUTF8String($i);
         |  int $prev = 0;
         |  for (int $j = 1; $j <= $n; $j++) {
         |    int $tmp = $dp[$j];
         |    if ($ci != null && !$b.isNullAt($j - 1)
         |        && $ci.equals($b.getUTF8String($j - 1))) {
         |      $dp[$j] = $prev + 1;
         |    } else if ($dp[$j - 1] > $dp[$j]) {
         |      $dp[$j] = $dp[$j - 1];
         |    }
         |    $prev = $tmp;
         |  }
         |}
         |${ev.value} = (long) $dp[$n];
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}
