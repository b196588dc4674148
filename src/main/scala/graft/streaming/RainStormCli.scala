package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{Cli, RainStormOps}

/** The RainStorm terminal verb as a string front-end — the analog of the
  * reference's quote-aware command loop
  * (`RainStorm <op1_exe> <op1_param> <op2_exe> <op2_param> <src> <dest>
  * <num_tasks>`, `core_process_stream_DS.go:1645-1842`, tokenized by
  * `splitWithQuotes`, `core_process_utils.go:475-496`). Operator names
  * resolve through [[RainStormOps.registry]]; parameters may be quoted so
  * they can contain spaces (`filter_contains 'Punched Telespar'`), exactly
  * like the reference's operator-exe arguments.
  */
object RainStormCli {

  final case class Command(
      op1: String, p1: String,
      op2: String, p2: String,
      src: String, dest: String,
      numTasks: Int,
      dokill: Boolean = false
  )

  /** Parse `RainStorm <op1> <p1> <op2> <p2> <src> <dest> <numTasks> [dokill]`.
    * Empty-string parameters (`''`) select each operator's default column,
    * mirroring the reference ops' default-argument behavior; the trailing
    * `dokill` flag requests mid-run fault injection
    * (`core_process_stream_DS.go:1706-1736`).
    */
  def parse(cmd: String): Command = {
    val toks = Cli.splitWithQuotes(cmd)
    require(toks.nonEmpty && toks.head.text == "RainStorm",
      s"expected a RainStorm command, got: $cmd")
    val args = toks.tail
    require(args.length == 7 || (args.length == 8 && args.last.text == "dokill"),
      s"RainStorm takes 7 arguments (op1 p1 op2 p2 src dest numTasks) plus optional 'dokill', got ${args.length}: $cmd")
    val Seq(op1, p1, op2, p2, src, dest, n) = args.take(7).map(_.text)
    Seq(op1, op2).foreach(o =>
      require(RainStormOps.registry.contains(o),
        s"unknown operator '$o'; known: ${RainStormOps.registry.keys.toSeq.sorted.mkString(", ")}"))
    Command(op1, p1, op2, p2, src, dest, n.toInt, dokill = args.length == 8)
  }

  /** Parse + launch: registry lookup → [[RainStorm.run]]. `numTasks` maps to
    * shuffle parallelism (session-scoped `spark.sql.shuffle.partitions` —
    * Spark's planner owns task counts, SURVEY §2.1 F8).
    *
    * With `dokill`, the query is killed after its first committed progress
    * and restarted against the SAME checkpoint — the reference's
    * fault-injection flag; exactly-once output must be unaffected (that is
    * the point of the flag, and what the streaming spec asserts).
    */
  def run(spark: SparkSession, cmd: String, checkpointDir: String): StreamingQuery = {
    val c = parse(cmd)
    spark.conf.set("spark.sql.shuffle.partitions", c.numTasks.toString)
    def launch(trigger: org.apache.spark.sql.streaming.Trigger): StreamingQuery =
      RainStorm.run(
        spark, c.src,
        RainStormOps.registry(c.op1)(c.p1),
        RainStormOps.registry(c.op2)(c.p2),
        checkpointDir, c.dest, trigger
      )
    if (!c.dokill) launch(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else {
      // Fault injection: process at least one micro-batch, kill, recover.
      val q1 = launch(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
      var waited = 0
      while (q1.recentProgress.isEmpty && waited < 60000) { Thread.sleep(100); waited += 100 }
      q1.stop()
      launch(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    }
  }
}
