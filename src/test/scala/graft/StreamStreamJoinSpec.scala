package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.RainStorm
import java.nio.file.Files

/** Stream-stream watermarked join parity: joining the view-stream to the
  * click-stream (click within 30 minutes after the view, same user) in
  * append mode must produce exactly the pairs the equivalent batch join
  * produces. This is the click/impression attribution shape — watermarks on
  * BOTH sides + the time-range join bound are what let Spark evict buffered
  * join state, keeping it bounded on unbounded streams.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def eventsByType(tpe: String) =
    Tables.events(spark, TestSpark.sf0001)
      .filter(col("event_type") === tpe)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))

  test("stream-stream watermarked inner join matches the batch join") {
    val viewsDir  = Files.createTempDirectory("ssj_views").toString
    val clicksDir = Files.createTempDirectory("ssj_clicks").toString
    eventsByType("view").repartition(3).write.mode("overwrite").parquet(viewsDir)
    eventsByType("click").repartition(3).write.mode("overwrite").parquet(clicksDir)

    def stream(dir: String) =
      spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)

    val joined = RainStorm.streamStreamJoin(
      stream(viewsDir), stream(clicksDir),
      keyCol = "user_id", tsCol = "ts",
      watermark = "1 hour", maxSpan = "30 minutes")

    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ss_join")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT user_id, l_ts, r_ts FROM ss_join")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      .sorted

    val batch = eventsByType("view").alias("v")
      .join(
        eventsByType("click").select(col("user_id").as("c_user"), col("ts").as("c_ts")),
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("ts") && col("c_ts") <= col("ts") + expr("INTERVAL 30 minutes"))
      .select(col("user_id"), col("ts"), col("c_ts"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      .sorted

    assert(streamed.nonEmpty, "join produced no pairs — fixture too sparse?")
    assert(streamed.toSeq == batch.toSeq)
  }
}
