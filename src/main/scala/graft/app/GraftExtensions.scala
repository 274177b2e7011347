package graft.app

import graft.functions.{MinHashSig, PolyHash, QuantDot, Shingles, SimHash64}
import org.apache.spark.sql.{GraftFunctionRegistrar, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for graft's native expressions.
  *
  * Two wiring options:
  *  - configuration: `spark.sql.extensions=graft.app.GraftExtensions`
  *    injects the functions at session build (the standard
  *    SparkSessionExtensions route);
  *  - code: `GraftExtensions.register(spark)` adds them as temp
  *    functions on an existing session.
  *
  * Registered names: graft_polyhash(str), graft_shingles(str, k),
  * graft_simhash64(array<bigint>), graft_quantdot(a, b),
  * graft_canonical_url(str), graft_gopher(str[, minWords, maxWords])
  * — the last two surface the round-6 curation battery to SQL users
  * (per-row built-in compositions bridged to expressions, so they
  * stay codegen'd).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}

object GraftExtensions {

  private def arity(name: String, n: Int,
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n)
        throw new IllegalArgumentException(
          s"$name expects $n argument(s), got ${args.length}")
      f(args)
    }

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def asCol(e: Expression) = org.apache.spark.sql.GraftColumnBridge.column(e)
  private def asExpr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftColumnBridge.catalystExpression(c)

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_polyhash" -> arity("graft_polyhash", 1, args => PolyHash(args.head)),
    "graft_shingles" -> arity("graft_shingles", 2, args =>
      Shingles(args.head, intArg(args(1), "shingle size"))),
    "graft_simhash64" -> arity("graft_simhash64", 1, args => SimHash64(args.head)),
    "graft_quantdot" -> arity("graft_quantdot", 2, args =>
      QuantDot(args.head, args(1))),
    "graft_canonical_url" -> arity("graft_canonical_url", 1, args =>
      asExpr(graft.text.WebAnalysis.canonicalizeUrl(asCol(args.head)))),
    // struct(n_words, mean_word_len, symbol_ratio, bullet_ratio,
    // ellipsis_ratio, alpha_word_ratio, stop_hits, pass)
    "graft_gopher" -> (args => args.length match {
      case 1 => asExpr(graft.text.TextAnalysis.gopherStruct(asCol(args.head)))
      case 3 => asExpr(graft.text.TextAnalysis.gopherStruct(asCol(args.head),
        intArg(args(1), "minWords"), intArg(args(2), "maxWords")))
      case n => throw new IllegalArgumentException(
        s"graft_gopher expects (text) or (text, minWords, maxWords), got $n argument(s)")
    }))

  /** Register on an existing session (temp functions + UDAFs). */
  def register(spark: SparkSession): Unit = {
    GraftFunctionRegistrar.register(spark, builders)
    registerUdafs(spark)
  }

  /** UDAFs go through the udf registry (a different mechanism than
    * expression injection — Aggregators carry their own encoders).
    * Registered: graft_weighted_mean(v DECIMAL, w DECIMAL) → DOUBLE.
    */
  def registerUdafs(spark: SparkSession): Unit = {
    implicit val inEnc: org.apache.spark.sql.Encoder[graft.functions.WeightedMean.In] =
      org.apache.spark.sql.Encoders.product[graft.functions.WeightedMean.In]
    spark.udf.register("graft_weighted_mean",
      org.apache.spark.sql.functions.udaf(graft.functions.WeightedMean))
  }
}
