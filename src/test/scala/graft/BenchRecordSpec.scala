package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The fork-isolated bench coordinator re-reads shard records written
  * by its own child JVMs; this pins the write→parse roundtrip,
  * including the hostile-value cases (braces and quotes inside error
  * messages) that would break a naive first-'}' scan.
  */
class BenchRecordSpec extends AnyFunSuite {

  private def roundtrip(results: Seq[(String, Double)],
                        errors: Seq[(String, String)]): (Map[String, Double], Map[String, String]) = {
    val f = Files.createTempFile("bench-rec", ".json")
    try {
      Bench.writeRecord(f.toString, results, errors, "/root/testdata/sf0.01")
      Bench.parseRecord(Files.readString(f))
    } finally Files.deleteIfExists(f)
  }

  test("clean record roundtrips exactly") {
    val (qs, errs) = roundtrip(
      Seq("q01_pricing_summary" -> 1.234567891, "q92_copurchase_rank" -> 5.6),
      Seq.empty)
    assert(qs === Map("q01_pricing_summary" -> 1.234567891, "q92_copurchase_rank" -> 5.6))
    assert(errs.isEmpty)
  }

  test("error messages with braces, quotes, and newlines survive the roundtrip") {
    val msg = """AnalysisException: cannot resolve "{x}" given {a, b}
near line 2"""
    val (qs, errs) = roundtrip(
      Seq("q10_intersect" -> -1.0, "q12_topk" -> 0.5),
      Seq("q10_intersect" -> msg))
    assert(qs === Map("q10_intersect" -> -1.0, "q12_topk" -> 0.5))
    assert(errs === Map("q10_intersect" -> msg))
  }

  test("failed-shard sentinel (-1 with shard-level message) parses") {
    val (qs, errs) = roundtrip(
      Seq("q44_repetition" -> -1.0),
      Seq("q44_repetition" -> "shard timeout after 1800s"))
    assert(qs("q44_repetition") === -1.0)
    assert(errs("q44_repetition") === "shard timeout after 1800s")
  }

  test("hostile escape shapes roundtrip: literal backslash-n, control chars, trailing backslash") {
    // chained String.replace unescaping corrupted exactly these:
    // a literal \n in the TEXT (backslash + 'n', not a newline) and
    // \u-escaped control characters
    val hostile = Seq(
      "literal\\nbackslash-n stays two chars",
      "tab\there and bell\u0007there",
      "quote\"brace}backslash\\mix",
      "ends with backslash\\")
    hostile.zipWithIndex.foreach { case (msg, i) =>
      val (_, errs) = roundtrip(Seq(s"q$i" -> -1.0), Seq(s"q$i" -> msg))
      assert(errs(s"q$i") === msg, s"case $i corrupted: ${errs(s"q$i")}")
    }
  }

  test("childVmArgs keeps heap/opens/spark props, drops launcher baggage") {
    val kept = Bench.childVmArgs(Seq(
      "-Xmx8g", "-Xss4m", "-XX:+UseG1GC",
      "--add-opens=java.base/java.nio=ALL-UNNAMED",
      "-Dspark.local.dir=/tmp/x", "-Dgraft.foo=1",
      "-agentlib:jdwp=transport=dt_socket,address=5005",
      "-Dsbt.script=/usr/bin/sbt", "-Dfile.encoding=UTF-8",
      "-javaagent:/opt/ide/debugger.jar"))
    assert(kept === Seq(
      "-Xmx8g", "-Xss4m", "-XX:+UseG1GC",
      "--add-opens=java.base/java.nio=ALL-UNNAMED",
      "-Dspark.local.dir=/tmp/x", "-Dgraft.foo=1"))
  }
}
