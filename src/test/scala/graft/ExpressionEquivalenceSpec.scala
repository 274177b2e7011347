package graft

import graft.functions.HashExpressions
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style equivalence: each native codegen expression must
  * agree with an independent naive Scala implementation on seeded
  * random inputs (and the codegen path must agree with the
  * interpreted path, which Spark exercises via both eval routes).
  */
class ExpressionEquivalenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)
  private val P = 1000000007L

  private def naivePolyHash(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % P)

  test("PolyHash == naive byte fold on random strings") {
    val cases = Seq.fill(300) {
      val len = rnd.nextInt(60)
      Seq.fill(len)((rnd.nextInt(94) + 33).toChar).mkString // printable ascii
    } :+ "" :+ "a" :+ "hello world"
    val got = cases.toDF("s")
      .select(TextAnalysis.polyHash($"s")).collect().map(_.getLong(0))
    assert(got.toSeq == cases.map(naivePolyHash))
  }

  test("QuantDot == BigInt dot product on random long arrays") {
    val cases = Seq.fill(200) {
      val n = rnd.nextInt(65)
      (Seq.fill(n)(rnd.nextInt(4000000).toLong - 2000000),
        Seq.fill(n)(rnd.nextInt(4000000).toLong - 2000000))
    }
    val got = cases.toDF("a", "b")
      .select(HashExpressions.quantDot($"a", $"b")).collect().map(_.getLong(0))
    val want = cases.map { case (a, b) =>
      a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum.toLong
    }
    assert(got.toSeq == want)
  }

  test("MinHashSig == naive per-function minimum") {
    val as = Seq(3L, 7L, 1000000L)
    val bs = Seq(11L, 0L, 999999999L)
    val cases = Seq.fill(100)(Seq.fill(rnd.nextInt(40) + 1)(
      rnd.nextLong().abs % P))
    val got = cases.toDF("h")
      .select(HashExpressions.minhashSig($"h", as, bs))
      .collect().map(_.getSeq[Long](0))
    val want = cases.map(hs =>
      as.zip(bs).map { case (a, b) => hs.map(x => (x * a + b) % P).min })
    assert(got.toSeq.map(_.toSeq) == want)
  }

  test("SimHash64 == naive bit voting") {
    val cases = Seq.fill(100)(Seq.fill(rnd.nextInt(50) + 1)(rnd.nextLong()))
    val got = cases.toDF("h")
      .select(HashExpressions.simhash64($"h")).collect().map(_.getLong(0))
    val want = cases.map { hs =>
      (0 until 64).foldLeft(0L) { (sig, b) =>
        val vote = hs.map(h => if (((h >>> b) & 1L) == 1L) 1 else -1).sum
        if (vote > 0) sig | (1L << b) else sig
      }
    }
    assert(got.toSeq == want)
  }

  test("QuantDot rejects dimension mismatches loudly") {
    // driver-side constant folding throws raw; executor paths wrap
    // in SparkException — accept either, require the message
    val e = intercept[Throwable] {
      Seq((Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("a", "b")
        .select(HashExpressions.quantDot($"a", $"b")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("dimension mismatch")))
  }

  test("SQL-registered expressions fail analysis on wrong input types") {
    graft.app.GraftExtensions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_polyhash(42)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }

  test("subword tokens split letter/digit boundaries inside a token") {
    val r = Seq("gpt4 is 2x faster!").toDF("s")
      .select(TextAnalysis.subwordTokens($"s")).head().getSeq[String](0)
    assert(r == Seq("gpt", "4", "is", "2", "x", "faster", "!"))
  }

  test("Shingles == naive sliding window over whitespace tokens") {
    val vocab = Vector("ab", "cde", "f", "gh1", "xyz")
    val cases = Seq.fill(200) {
      Seq.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    } :+ "  leading and  double  spaces " :+ ""
    for (k <- Seq(1, 2, 3)) {
      val got = cases.toDF("s")
        .select(TextAnalysis.shingles($"s", k)).collect()
        .map(_.getSeq[String](0).toSeq)
      val want = cases.map { s =>
        val toks = s.split("\\s+").filter(_.nonEmpty).toSeq
        if (toks.size < k) Seq.empty
        else toks.sliding(k).map(_.mkString(" ")).toSeq
      }
      assert(got.toSeq == want, s"k=$k")
    }
  }
}

/** The sorted-run fold (topNgramCount) vs a naive Scala mode count
  * on seeded random token streams with planted repetition.
  */
class RunFoldEquivalenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(77)

  private def naiveTopBigram(text: String): Long = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < 2) 0L
    else toks.sliding(2).map(_.mkString(" ")).toSeq
      .groupBy(identity).values.map(_.size.toLong).max
  }

  test("topNgramCount == naive sliding-window mode on random texts") {
    val vocab = Seq("a", "b", "c", "dd", "ee")
    val cases = Seq.fill(300) {
      Seq.fill(rnd.nextInt(30) + 2)(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    } :+ "x" :+ "x y" :+ "r r r r r r"
    val got = cases.toDF("t")
      .select(graft.text.TextAnalysis.topNgramCount($"t", 2))
      .collect().map(_.getLong(0))
    assert(got.toSeq == cases.map(naiveTopBigram))
  }
}
