package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.RainStorm

/** Chained stateful aggregations: windowed counts → per-window top-k must
  * close each window exactly once with the batch-identical answer.
  */
class TrendingTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-window trending top-k equals batch counts on closed windows") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // window 1 (12:00): a×3 b×2 c×1 — window 2 (13:00): b×2 d×1
    val w1 = Seq("a", "a", "a", "b", "b", "c").map((_, ts("2026-01-01 12:10:00")))
    val w2 = Seq("b", "b", "d").map((_, ts("2026-01-01 13:20:00")))

    val in = MemoryStream[(String, java.sql.Timestamp)]
    val out = RainStorm.trendingTopK(in.toDF.toDF("token", "ts"), "token", "ts", k = 2)
    val q = out.writeStream.outputMode("append").format("memory").queryName("trending").start()
    try {
      in.addData(w1.toIndexedSeq: _*)
      in.addData(w2.toIndexedSeq: _*)
      q.processAllAvailable()
      in.addData(("zzz", ts("2026-01-02 12:00:00"))) // advance watermark, close both
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.sql(
      "SELECT window.start, t.token, t.n FROM trending LATERAL VIEW explode(topk) AS t ORDER BY 1, 3 DESC, 2")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toList
    assert(rows === List(
      ("2026-01-01 12:00:00.0", "a", 3L), ("2026-01-01 12:00:00.0", "b", 2L),
      ("2026-01-01 13:00:00.0", "b", 2L), ("2026-01-01 13:00:00.0", "d", 1L)))
  }

  test("sketch top-k (bounded Misra-Gries stage two) equals the exact form when slots >= vocab") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val w1 = Seq("a", "a", "a", "b", "b", "c").map((_, ts("2026-01-01 12:10:00")))
    val w2 = Seq("b", "b", "d").map((_, ts("2026-01-01 13:20:00")))

    // slots = 8 >= the 4-token vocabulary: no counter ever sheds, so the
    // sketch's counts are exact and the output must match trendingTopK's
    // closed-window rows bit-for-bit (same tie-break: n desc, token asc).
    val in = MemoryStream[(String, java.sql.Timestamp)]
    val out = RainStorm.trendingTopKSketch(
      in.toDF.toDF("token", "ts"), "token", "ts", k = 2, slots = 8)
    val q = out.writeStream.outputMode("append").format("memory").queryName("trending_mg").start()
    try {
      in.addData(w1.toIndexedSeq: _*)
      in.addData(w2.toIndexedSeq: _*)
      q.processAllAvailable()
      in.addData(("zzz", ts("2026-01-02 12:00:00"))) // advance watermark, close both
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.sql(
      "SELECT window.start, t.token, t.n FROM trending_mg LATERAL VIEW explode(topk) AS t ORDER BY 1, 3 DESC, 2")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toList
    assert(rows === List(
      ("2026-01-01 12:00:00.0", "a", 3L), ("2026-01-01 12:00:00.0", "b", 2L),
      ("2026-01-01 13:00:00.0", "b", 2L), ("2026-01-01 13:00:00.0", "d", 1L)))
  }

  test("sketch top-k under shedding still surfaces every token with frequency > n/slots") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // One window, n = 40 tokens: "hot" ×20, "warm" ×10, then 10 distinct
    // cold singletons. slots = 4 < vocab (12) forces shedding; MG guarantees
    // every token with freq > 40/4 = 10 survives — that's exactly {hot}, and
    // warm (=10) may or may not; rare singletons must never outrank hot.
    val cold  = (1 to 10).map(i => s"cold$i")
    val toks  = Seq.fill(20)("hot") ++ Seq.fill(10)("warm") ++ cold
    val in = MemoryStream[(String, java.sql.Timestamp)]
    val out = RainStorm.trendingTopKSketch(
      in.toDF.toDF("token", "ts"), "token", "ts", k = 2, slots = 4)
    val q = out.writeStream.outputMode("append").format("memory").queryName("trending_shed").start()
    try {
      in.addData(toks.map((_, ts("2026-01-01 12:10:00"))).toIndexedSeq: _*)
      q.processAllAvailable()
      in.addData(("zzz", ts("2026-01-02 12:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val top = spark.sql(
      "SELECT t.token FROM trending_shed LATERAL VIEW explode(topk) AS t ORDER BY t.n DESC")
      .collect().map(_.getString(0)).toList
    assert(top.headOption.contains("hot"), s"hot (freq 20 > n/slots) must be reported first, got $top")
    assert(!top.exists(_.startsWith("cold")) || top.indexOf("hot") < top.indexWhere(_.startsWith("cold")),
      s"a singleton must not outrank the true heavy hitter: $top")
  }
}
