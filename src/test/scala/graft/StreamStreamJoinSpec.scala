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

  test("stream-stream LEFT OUTER join emits null-padded rows once the watermark closes them") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val leftIn  = MemoryStream[(Long, java.sql.Timestamp)]
    val rightIn = MemoryStream[(Long, java.sql.Timestamp)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

    val joined = RainStorm.streamStreamJoin(
      leftIn.toDF.toDF("user_id", "ts"), rightIn.toDF.toDF("user_id", "ts"),
      keyCol = "user_id", tsCol = "ts",
      watermark = "10 minutes", maxSpan = "5 minutes", joinType = "leftOuter")

    val q = joined.writeStream
      .outputMode("append").format("memory").queryName("ss_left_join").start()
    try {
      // user 1 gets a match in-window; user 2 never does.
      leftIn.addData((1L, ts(0)), (2L, ts(1)))
      rightIn.addData((1L, ts(2)))
      q.processAllAvailable()
      // Advance both watermarks far past left rows + maxSpan so the unmatched
      // left row can be finalized as null-padded.
      leftIn.addData((9L, ts(50)))
      rightIn.addData((9L, ts(50)))
      q.processAllAvailable()
      leftIn.addData((9L, ts(55))) // one more batch so the state eviction emits
      rightIn.addData((9L, ts(55)))
      q.processAllAvailable()

      val rows = spark.sql("SELECT user_id, r_ts FROM ss_left_join WHERE user_id IN (1, 2)")
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(rows(1L).isDefined, "matched pair must carry the right-side time")
      assert(rows.get(2L).exists(_.isEmpty), "unmatched left row must surface null-padded after watermark passes")
    } finally q.stop()
  }

  test("streaming near-dup filter drops cross-batch near-duplicates, passes distinct docs") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.TextAnalysis
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // Find a real planted near-dup pair whose fingerprints agree on band 0
    // and sit within Hamming 6 — the regime the single-band filter covers.
    val sims = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"), TextAnalysis.simHash64(col("text")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val pair = (for {
      a <- sims.iterator
      b <- sims
      if a._1 < b._1 && (a._3 & 0xffffL) == (b._3 & 0xffffL) &&
        java.lang.Long.bitCount(a._3 ^ b._3) <= 6
    } yield (a, b)).toSeq.headOption
    assert(pair.isDefined, "fixture must contain a band-0-agreeing near-dup pair")
    val (first, dup) = pair.get
    val distinctDoc = sims.find(s =>
      java.lang.Long.bitCount(s._3 ^ first._3) > 6 && s._1 != first._1).get

    val in = MemoryStream[(Long, String)]
    val q = RainStorm.nearDupFilterStream(spark, in.toDS(), maxHamming = 6)
      .toDF("doc_id", "text")
      .writeStream.outputMode("append").format("memory").queryName("neardup_filter").start()
    try {
      in.addData((first._1, first._2))           // batch 1: original passes
      q.processAllAvailable()
      in.addData((dup._1, dup._2), (distinctDoc._1, distinctDoc._2)) // batch 2
      q.processAllAvailable()
      val passed = spark.sql("SELECT doc_id FROM neardup_filter").collect().map(_.getLong(0)).toSet
      assert(passed.contains(first._1))
      assert(passed.contains(distinctDoc._1), "distinct doc must pass")
      assert(!passed.contains(dup._1), "cross-batch near-dup must be dropped by kept state")
    } finally q.stop()
  }

  test("near-dup filter: stream over id-ordered micro-batches == one batch pass") {
    // The registry's x_neardup_filter surfaces nearDupFilterBatch; this pins
    // it to the streaming operator: same bucket keying, same greedy
    // kept-only scan, state carrying across micro-batches == one batch scan.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.TextAnalysis
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val (b1, b2) = docs.splitAt(docs.length / 2)

    val in = MemoryStream[(Long, String)]
    val q = RainStorm.nearDupFilterStream(spark, in.toDS(), maxHamming = 6)
      .toDF("doc_id", "text")
      .writeStream.outputMode("append").format("memory").queryName("neardup_eq").start()
    try {
      in.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT doc_id FROM neardup_eq")
      .collect().map(_.getLong(0)).toSet

    val fps = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), TextAnalysis.simHash64(col("text")).as("fp"))
    val batched = RainStorm.nearDupFilterBatch(spark, fps, "doc_id", "fp", maxHamming = 6)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    assert(streamed == batched,
      s"stream-only ${streamed -- batched}, batch-only ${batched -- streamed}")
  }

  test("stream-static enrichment join broadcasts the dimension and enriches every event") {
    val eventsDir = Files.createTempDirectory("enrich_events").toString
    Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("event_type"))
      .write.mode("overwrite").parquet(eventsDir)
    val dim = Tables.customer(spark, TestSpark.sf0001)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))

    val stream = spark.readStream.schema(spark.read.parquet(eventsDir).schema).parquet(eventsDir)
    val q = RainStorm.enrichWithStatic(stream, dim, "user_id")
      .writeStream.outputMode("append").format("memory").queryName("enriched")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.sql("SELECT count(*) AS n, count(c_mktsegment) AS matched FROM enriched").collect()(0)
    val batch = spark.read.parquet(eventsDir).join(dim, Seq("user_id"), "left")
    assert(got.getLong(0) == batch.count())
    assert(got.getLong(1) == batch.filter(col("c_mktsegment").isNotNull).count())
    assert(got.getLong(1) > 0, "no events matched a customer — fixture drift?")
  }
}
