package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The distributed-grep (MP1) query surface as a single Spark job.
  *
  * The reference scatter-gathers a raw `grep` command to every alive peer,
  * shells out per node, and re-aggregates counts (`core_process.go:91-124,
  * 259-349,455-478`). Here the whole surface is one DataFrame scan: per-file
  * parallelism comes from input splits, liveness from the scheduler, and the
  * documented flag surface (`README.md:266-348` in the reference: `-c`, `-i`,
  * `-v`, `-E`, pipe chains) becomes a chain of `rlike` filters.
  *
  * At 100 TB scale this shape matters: the regex filter is applied inside the
  * scan stage (no shuffle at all for full-line mode; a single partial→final
  * agg for count mode), so throughput is bounded by IO, not coordination.
  */
object GrepEngine {

  /** One stage of a grep pipe chain. */
  final case class GrepStage(pattern: String, invert: Boolean = false, ignoreCase: Boolean = false)

  /** Load a logs directory as a `(file, value)` table — the Spark analog of
    * per-node `vm(i).log` files (`core_process.go:157-162`).
    */
  def logs(spark: SparkSession, path: String): DataFrame =
    spark.read
      .textFile(path)
      .select(input_file_name().as("file"), col("value"))

  private def applyStage(df: DataFrame, s: GrepStage): DataFrame = {
    val pat     = if (s.ignoreCase) "(?i)" + s.pattern else s.pattern
    val matches = col("value").rlike(pat)
    df.filter(if (s.invert) !matches else matches)
  }

  /** Full-line mode: all matching lines with their source file. */
  def matchLines(logs: DataFrame, stages: Seq[GrepStage]): DataFrame =
    stages.foldLeft(logs)(applyStage)

  /** `grep -c` mode: per-file match counts (the reference's per-machine
    * counts, `core_process.go:292-344`).
    */
  def countPerFile(logs: DataFrame, stages: Seq[GrepStage]): DataFrame =
    matchLines(logs, stages).groupBy(col("file")).agg(count(lit(1)).as("matches"))

  /** Grand-total count (the reference's aggregated total). */
  def countTotal(logs: DataFrame, stages: Seq[GrepStage]): DataFrame =
    matchLines(logs, stages).agg(count(lit(1)).as("matches"))

  /** Command-line translator for the documented surface:
    * `grep [-c] [-i] [-v] [-E] PATTERN [| grep ...]`. Quote-aware: `|` inside
    * a quoted pattern is regex alternation, not a pipe (`grep 'a|b'` is ONE
    * stage), and a quoted pattern is never mistaken for a flag even if it
    * starts with `-`. Returns the stages and whether count mode was requested
    * anywhere in the chain.
    */
  private val knownFlags = Set("-c", "-i", "-v", "-E")

  def parse(cmd: String): (Seq[GrepStage], Boolean) = {
    var countMode = false
    val stages = Cli.splitUnquoted(cmd, '|').map(_.trim).filter(_.nonEmpty).map { seg =>
      val toks          = Cli.splitWithQuotes(seg).filterNot(t => !t.quoted && t.text == "grep")
      val (flags, rest) = toks.span(t => !t.quoted && knownFlags.contains(t.text))
      val pat           = rest.map(_.text).mkString(" ")
      if (flags.exists(_.text == "-c")) countMode = true
      GrepStage(pat, invert = flags.exists(_.text == "-v"), ignoreCase = flags.exists(_.text == "-i"))
    }
    (stages, countMode)
  }

  /** End-to-end: translate a grep command and run it over a logs table. */
  def run(logs: DataFrame, cmd: String): DataFrame = {
    val (stages, countMode) = parse(cmd)
    if (countMode) countPerFile(logs, stages) else matchLines(logs, stages)
  }

  /** Deterministic test-log generator, reimplementing the reference's
    * `generate_test_log_file` (`core_process.go:42-86`): pattern×10,
    * `Random text`×100, `100 200 300`×1000 — so expected grep counts are
    * closed-form (G4).
    */
  def generateTestLog(patterns: Seq[String]): Seq[String] =
    patterns.flatMap(p => Seq.fill(10)(p.split("\\s+").head)) ++
      Seq.fill(100)("Random text") ++
      Seq.fill(1000)("100 200 300")
}
