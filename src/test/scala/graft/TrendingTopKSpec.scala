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
}
