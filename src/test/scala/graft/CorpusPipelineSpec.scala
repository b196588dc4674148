package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.RainStorm
import graft.functions.TextAnalysis

/** End-to-end streaming corpus-ingest pipeline: the library's pieces must
  * COMPOSE — documents stream in over micro-batches, pass the streaming
  * near-dup filter, get text metrics from the native kernels, and aggregate
  * per predicted language — and the whole thing must equal an in-memory
  * simulation of the same stages. This is the shape of a real training-data
  * ingest job (dedup → quality/language gates → corpus stats).
  */
class CorpusPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming ingest: near-dup filter → lang-ID/token metrics → per-lang stats") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val (batch1, batch2) = docs.splitAt(docs.length / 2)

    val in = MemoryStream[(Long, String)]
    val deduped = RainStorm.nearDupFilterStream(spark, in.toDS(), maxHamming = 6)
      .toDF("doc_id", "text")
      .select(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang"),
        graft.functions.NativeFns.token_counts(col("text"), Nil).getField("n_tokens").as("n_tokens"))
    val q = deduped.writeStream
      .outputMode("append").format("memory").queryName("corpus_ingest").start()
    try {
      in.addData(batch1.toIndexedSeq: _*); q.processAllAvailable()
      in.addData(batch2.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.sql(
      "SELECT lang, count(*) AS n_docs, sum(n_tokens) AS n_tokens FROM corpus_ingest GROUP BY lang")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    // In-memory simulation of the same stages (fingerprints from the batch
    // kernel; same single-band first-wins-by-doc_id semantics).
    val sims = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"), TextAnalysis.simHash64(col("text")).as("s"),
        TextAnalysis.langId(col("text")).as("lang"),
        graft.functions.NativeFns.token_counts(col("text"), Nil).getField("n_tokens").as("nt"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val seen = scala.collection.mutable.Map.empty[Long, List[Long]]
    val passed = (batch1.map(_._1).toSeq, batch2.map(_._1).toSeq) match {
      case (b1, b2) =>
        (Seq(b1, b2).flatMap { batchIds =>
          val inBatch = sims.filter(s => batchIds.contains(s._1))
          inBatch.flatMap { case (id, sim, lang, nt) =>
            val bucket = sim & 0xffffL
            val fps    = seen.getOrElse(bucket, Nil)
            if (fps.exists(f => java.lang.Long.bitCount(f ^ sim) <= 6)) None
            else { seen(bucket) = sim :: fps; Some((lang, nt)) }
          }
        })
    }
    val expected = passed.groupBy(_._1).map { case (lang, xs) =>
      lang -> (xs.size.toLong, xs.map(_._2).sum)
    }
    assert(passed.size < docs.length, "near-dup filter must drop the planted duplicates")
    assert(streamed == expected)
  }
}
