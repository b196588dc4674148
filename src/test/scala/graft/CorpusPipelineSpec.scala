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

  test("streaming set-similarity join finds exactly the exact-Jaccard cross pairs") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // Split the corpus into two streams (even/odd doc_id) with a shared
    // synthetic event time, so cross-stream planted near-dups must surface.
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val ts   = java.sql.Timestamp.valueOf("2026-01-01 12:00:00")
    val even = docs.filter(_._1 % 2 == 0).map { case (id, t) => (id, t, ts) }
    val odd  = docs.filter(_._1 % 2 == 1).map { case (id, t) => (id, t, ts) }

    val lIn = MemoryStream[(Long, String, java.sql.Timestamp)]
    val rIn = MemoryStream[(Long, String, java.sql.Timestamp)]
    val joined = RainStorm.streamingSimilarityJoin(
      lIn.toDF.toDF("doc_id", "text", "ts"), rIn.toDF.toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts", threshold = 0.8)
    val q = joined.writeStream
      .outputMode("append").format("memory").queryName("sim_join").start()
    try {
      lIn.addData(even.toIndexedSeq: _*)
      rIn.addData(odd.toIndexedSeq: _*)
      q.processAllAvailable()
      // advance watermarks so the pair-dedup state can finalize emissions
      val late = java.sql.Timestamp.valueOf("2026-01-01 16:00:00")
      lIn.addData((999999L, "zzz", late)); rIn.addData((999998L, "yyy", late))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.sql("SELECT id_a, id_b FROM sim_join WHERE id_a < 999000 AND id_b < 999000")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // Exact ground truth: all even×odd pairs with 3-gram Jaccard >= 0.8.
    def sh(t: String) = {
      val toks = t.split(" ").filter(_.nonEmpty)
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet else Set(toks.mkString(" "))
    }
    val exact = even.iterator.flatMap { case (ia, ta, _) =>
      val sa = sh(ta)
      odd.flatMap { case (ib, tb, _) =>
        val sb    = sh(tb)
        val inter = (sa & sb).size
        val uni   = sa.size + sb.size - inter
        if (uni == 0 || inter.toDouble / uni >= 0.8) Some((ia, ib)) else None
      }
    }.toSet
    assert(exact.nonEmpty, "even/odd split must separate at least one planted pair")
    assert(streamed == exact,
      s"streaming similarity join: got ${streamed.size} pairs, exact ${exact.size}; " +
        s"missing=${(exact -- streamed).take(3)} spurious=${(streamed -- exact).take(3)}")

    // The batch form (the registry's `x_stream_set_similarity` surface) is the
    // identical plan minus watermark bookkeeping — same inputs, same answer.
    val batched = RainStorm.setSimilarityJoinBatch(
        even.toSeq.toDF("doc_id", "text", "ts"), odd.toSeq.toDF("doc_id", "text", "ts"),
        "doc_id", "text", "ts", threshold = 0.8)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batched == exact,
      s"batch set-similarity join diverged from exact: missing=${(exact -- batched).take(3)} " +
        s"spurious=${(batched -- exact).take(3)}")
  }

  test("streaming curation trilogy: C4 clean + Gopher gate per micro-batch == batch") {
    // The C4 line cleaner and Gopher quality gate are pure projections, so
    // they compose into a stream with NO state and NO semantic drift: the
    // same kernel columns applied per micro-batch must equal one batch pass.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.{Curation, NativeFns}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val pages = (0L until 40L).map { i =>
      val body = (1 to 30).map(w => s"body line doc${i}x token tok${w}y okay.").mkString("\n")
      val page = i % 4 match {
        case 0 => body + "\nthe be to of and that have with all here."
        case 1 => body + "\nplease enable javascript to continue now."
        case 2 => body + ("\n- bullet item." * 40)
        case _ => body
      }
      (i, page)
    }
    def curate(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), NativeFns.c4_line_clean(col("page")).as("c"))
        .select(col("doc_id"), col("c.clean").as("clean"))
        .select(col("doc_id") +: Curation.gopherQuality(col("clean"), minWords = 20): _*)
        .select(col("doc_id"), col("n_words"), col("keep"))

    val in = MemoryStream[(Long, String)]
    val q = curate(in.toDF().toDF("doc_id", "page"))
      .writeStream.outputMode("append").format("memory").queryName("curation_stream").start()
    try {
      in.addData(pages.take(20): _*); q.processAllAvailable()
      in.addData(pages.drop(20): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT * FROM curation_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = curate(pages.toDF("doc_id", "page"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    // sanity: the gates are live — javascript docs lose a line, bullet docs fail keep
    val byId = batch.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(0L)._2 == 1L, "stopword-endowed doc must pass")
    assert(byId(2L)._2 == 0L, "bullet-flooded doc must fail the Gopher gate")
  }
}
