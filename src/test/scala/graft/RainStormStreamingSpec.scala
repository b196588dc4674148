package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.RainStorm
import java.nio.file.Files

/** Streaming parity tests: word-count running aggregate vs the batch oracle,
  * and the reference's `dokill` fault-injection reproduced as kill/restart
  * against the same checkpoint (exactly-once: final state identical).
  */
class RainStormStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Write the documents' texts as a small multi-file text corpus. */
  private def writeCorpus(): String = {
    val dir = tmpDir("corpus")
    Tables.documents(spark, TestSpark.sf0001)
      .select(col("text"))
      .repartition(4)
      .write.mode("overwrite").text(dir)
    dir
  }

  private def batchWordCount(srcDir: String) =
    spark.read.text(srcDir)
      .select(explode(split(col("value"), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("streaming word count matches batch oracle") {
    val src  = writeCorpus()
    val dest = tmpDir("dest")
    val q = RainStorm.wordCount(spark, src, tmpDir("ckpt"), dest)
    q.awaitTermination(120000)
    val streamed = RainStorm.quantify(spark, dest)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batchWordCount(src))
  }

  test("kill/restart against same checkpoint is exactly-once (dokill analog)") {
    val src  = writeCorpus()
    val dest = tmpDir("dest")
    val ckpt = tmpDir("ckpt")
    // Phase 1: process only part of the input (1 file per micro-batch), then
    // kill the query mid-stream.
    val q1 = RainStorm.wordCount(spark, src, ckpt, dest, maxFilesPerTrigger = Some(1),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    var waited = 0
    while (q1.recentProgress.length < 2 && waited < 60000) { Thread.sleep(200); waited += 200 }
    q1.stop() // the kill
    // Phase 2: restart from the same checkpoint, drain the rest.
    val q2 = RainStorm.wordCount(spark, src, ckpt, dest)
    q2.awaitTermination(120000)
    val streamed = RainStorm.quantify(spark, dest)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batchWordCount(src), "final state after kill/restart must equal batch oracle")
  }

  test("generic RainStorm.run pipeline (op1 -> op2) matches batch") {
    import graft.operators.RainStormOps
    val src  = writeCorpus()
    val dest = tmpDir("dest")
    // op1 = split operator from the registry, op2 = count-by-key: the
    // `RainStorm split count src dest` CLI shape.
    val q = RainStorm.run(
      spark, src,
      RainStormOps.registry("split")("value"),
      RainStormOps.countByKey(col("word"), "cnt"),
      tmpDir("ckpt"), dest
    )
    q.awaitTermination(120000)
    val streamed = RainStorm.quantify(spark, dest)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = spark.read.text(src)
      .select(explode(split(col("value"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("typed running count-by-key emits running totals") {
    import spark.implicits._
    val keyed = Seq(("a", "x"), ("b", "y"), ("a", "z")).toDS()
    val out = RainStorm.runningCountByKey(spark, keyed).collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }
}
