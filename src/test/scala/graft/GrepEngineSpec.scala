package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GrepEngine
import java.nio.file.{Files, Paths}

/** The reference's `generate_logs_and_verify` test reimplemented
  * (closed-form expected counts per FIXTURES.md §5).
  */
class GrepEngineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val patterns = Seq("ERROR something", "WARNING else", "DEBUG now")

  private def writeLogs(nNodes: Int): String = {
    val dir = Files.createTempDirectory("logs").toString
    (1 to nNodes).foreach { i =>
      val lines = GrepEngine.generateTestLog(patterns)
      Files.write(Paths.get(s"$dir/vm$i.log"), String.join("\n", lines: _*).getBytes)
    }
    dir
  }

  test("per-file counts: pattern x10 per node") {
    val dir  = writeLogs(3)
    val logs = GrepEngine.logs(spark, dir)
    val counts = GrepEngine.countPerFile(logs, Seq(GrepEngine.GrepStage("ERROR"))).collect()
    assert(counts.length == 3)
    assert(counts.forall(_.getLong(1) == 10L))
  }

  test("total count: '200' x1000 per node") {
    val dir  = writeLogs(2)
    val logs = GrepEngine.logs(spark, dir)
    val total = GrepEngine.countTotal(logs, Seq(GrepEngine.GrepStage("200"))).collect()(0).getLong(0)
    assert(total == 2000L)
  }

  test("parser is quote-aware: alternation in quotes, dash-led quoted patterns") {
    import GrepEngine.GrepStage
    // '|' inside quotes is regex alternation, not a pipe stage boundary.
    val (s1, _) = GrepEngine.parse("grep 'ERROR|WARNING'")
    assert(s1 == Seq(GrepStage("ERROR|WARNING")))
    // A quoted pattern starting with '-' is a pattern, not a flag.
    val (s2, _) = GrepEngine.parse("grep '-v'")
    assert(s2 == Seq(GrepStage("-v")))
    // Flags + quoted multi-word pattern + unquoted pipe stage.
    val (s3, cm) = GrepEngine.parse("grep -c -i 'a b' | grep -v xyz")
    assert(cm)
    assert(s3 == Seq(GrepStage("a b", invert = false, ignoreCase = true),
                     GrepStage("xyz", invert = true)))
  }

  test("pipe chain with -v and -i via command parser") {
    val dir  = writeLogs(1)
    val logs = GrepEngine.logs(spark, dir)
    // 'Random text' x100; invert drops them all
    val kept = GrepEngine.run(logs, "grep -i 'random' | grep -v 'text'")
    assert(kept.count() == 0L)
    val counts = GrepEngine.run(logs, "grep -c 'Random'")
    assert(counts.collect()(0).getLong(1) == 100L)
  }
}
