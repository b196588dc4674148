package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.RainStorm
import java.nio.file.Files

/** Event-time streaming parity: the watermarked windowed aggregate over the
  * events table must converge to the same totals as the batch query, and the
  * flatMapGroupsWithState sessionizer must agree with the batch lag+cumsum
  * sessionization (h9).
  */
class EventTimeStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming event-time window counts converge to batch h8 counts") {
    val src = Files.createTempDirectory("events_src").toString
    Tables.events(spark, TestSpark.sf0001)
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"))
      .repartition(3)
      .write.mode("overwrite").parquet(src)

    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .parquet(src)
    val q = RainStorm.eventTimeWindowCounts(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("win_counts")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT window_start, event_type, n FROM win_counts")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Tables.events(spark, TestSpark.sf0001)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp").as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState sessionizer matches batch sessionization") {
    import spark.implicits._
    val events = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").as("sec"))
      .as[(Long, Long)]
    val got = RainStorm.sessionize(spark, events)
      .collect().map(s => s.userId -> s.sessionId).toMap
    // batch oracle: h9-style lag+cumsum session count per user
    val batch = graft.queries.Headline.h9.run(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == batch)
  }

  test("late-data accounting: watermark drops are counted on progress, not silent") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")

    val in = MemoryStream[(java.sql.Timestamp, String)]
    val agg = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("k"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_drop").start()
    try {
      // batch 1: two on-time rows in the 10:00 window; 12:00 drives the
      // watermark to 11:50 at end-of-batch, past the window's 10:10 end
      in.addData((ts("10:00"), "a"), (ts("10:05"), "a"), (ts("12:00"), "a"))
      q.processAllAvailable()
      // batch 2: 10:01 is now BELOW the watermark — the state operator must
      // drop it (the finalized 10:00 window emits with n=2, not 3) and the
      // drop must be visible on progress as numRowsDroppedByWatermark
      in.addData((ts("10:01"), "a"), (ts("12:01"), "a"))
      q.processAllAvailable()
    } finally q.stop()

    val win10 = spark.table("late_drop")
      .filter(col("ws") === ts("10:00")).collect()
    assert(win10.map(_.getAs[Long]("n")).toSeq == Seq(2L),
      "the closed 10:00 window must hold only the on-time rows")
    val dropped = q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq.map(_.numRowsDroppedByWatermark)).sum
    assert(dropped == 1L,
      s"exactly the one late row must be counted as dropped by the watermark (got $dropped)")
  }
}
