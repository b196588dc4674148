package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{BpeTrain, NativeFns}

/** BPE vocabulary induction: the distributed trainer against an independent
  * in-memory reference implementation, the merge-application kernel's greedy
  * semantics, and the encode face's gates.
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Independent reference BPE (word-dict formulation, same tie-break). */
  private def refBpe(words: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var dict = words.map { case (w, c) => (w.map(_.toString).toVector :+ "</w>") -> c }.toSeq
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 0 until k) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- dict; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        dict = dict.map { case (syms, wc) =>
          val m = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) { m += l + r; i += 2 }
            else { m += syms(i); i += 1 }
          }
          (m.result(), wc)
        }
      }
    }
    out.result()
  }

  test("train matches an independent reference BPE on the paper-style corpus") {
    import spark.implicits._
    // Word frequencies low:5 lower:2 newest:6 widest:3 (Sennrich et al. §3).
    val docs = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = docs.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val got = BpeTrain.train(df, "text", 6).map(m => (m.left, m.right, m.pairCount))
    val want = refBpe(Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 6)
    assert(got == want, s"got $got\nwant $want")
  }

  test("train is deterministic across runs") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(100)
    val a = BpeTrain.train(docs, "text", 4)
    val b = BpeTrain.train(docs, "text", 4)
    assert(a == b)
  }

  test("driver-local and distributed merge loops learn the identical table") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(100)
    // Threshold 0 forces the distributed per-merge-job loop; the default
    // takes the collected driver-local path. Same argmax total order on
    // both sides => byte-identical merge tables.
    val local = BpeTrain.train(docs, "text", 8)
    val dist  = BpeTrain.train(docs, "text", 8, maxDriverWords = 0L)
    assert(local == dist, s"local $local\ndist $dist")
  }

  test("non-BMP words: local and distributed loops split code-point-identically") {
    import spark.implicits._
    // U+1F600 and U+1D54F are surrogate PAIRS in UTF-16. Spark's
    // split(w, "") keeps them whole, so the driver-local path must iterate
    // code points — a charAt split would learn a different merge table and
    // tie-break on lone surrogates.
    val docs = (Seq.fill(4)("a😀b😀") ++
      Seq.fill(3)("😀😀c") ++ Seq.fill(2)("𝕏y𝕏y"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val local = BpeTrain.train(docs, "text", 6)
    val dist  = BpeTrain.train(docs, "text", 6, maxDriverWords = 0L)
    assert(local == dist, s"local $local\ndist $dist")
    // No learned symbol may begin or end mid-surrogate-pair.
    def whole(s: String): Boolean = s.nonEmpty &&
      !Character.isLowSurrogate(s.charAt(0)) && !Character.isHighSurrogate(s.charAt(s.length - 1))
    assert(local.forall(m => whole(m.left) && whole(m.right)), s"lone surrogate in $local")
  }

  test("k=1000 merges train in seconds once the dict is driver-local") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val t0 = System.nanoTime()
    val merges = BpeTrain.train(docs, "text", 1000)
    val secs = (System.nanoTime() - t0) / 1e9
    // Either the vocabulary saturates (every word fully merged - counts run
    // dry and the trainer stops early) or we got all 1000; both are fine,
    // what matters is the loop is not 1000 Spark jobs.
    assert(merges.nonEmpty && merges.map(m => (m.left, m.right)).distinct.size == merges.size)
    assert(secs < 30.0, s"driver-local k=1000 took ${secs}s - loop is not driver-local?")
  }

  test("bpe_apply: greedy left-to-right, overlapping runs do not double-merge") {
    import spark.implicits._
    def apply1(syms: Seq[String], a: String, b: String): Seq[String] =
      Seq(Tuple1(syms)).toDF("s")
        .select(NativeFns.bpe_apply(col("s"), a, b)).head().getSeq[String](0)
    assert(apply1(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(apply1(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(apply1(Seq("x", "y"), "a", "b") == Seq("x", "y"))
    assert(apply1(Seq.empty[String], "a", "b") == Seq.empty[String])
  }

  test("bpe_token_count: zero merges = chars+1 per word; more merges never increase") {
    import spark.implicits._
    val df = Seq((0L, "low lower newest")).toDF("id", "text")
    def count(merges: Seq[(String, String)]): Long =
      df.select(NativeFns.bpe_token_count(col("text"), merges)).head().getLong(0)
    // 3+1 + 5+1 + 6+1 = 17 symbols with no merges.
    assert(count(Nil) == 17L)
    val trained = BpeTrain.train(df, "text", 8).map(m => (m.left, m.right))
    val counts = (0 to trained.length).map(k => count(trained.take(k)))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"token count must be monotone non-increasing in merges: $counts")
    assert(counts.last < counts.head, "8 merges must actually compress")
  }

  test("wordFreqs touches the corpus once; pair counts run on the vocab frame") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val plan = BpeTrain.pairCounts(BpeTrain.wordFreqs(docs, "text"))
      .queryExecution.executedPlan.toString
    // Two aggregations (word count, pair count) — and no join of any kind:
    // the corpus is never re-read per round.
    assert(!plan.contains("Join"), s"trainer must not join:\n$plan")
  }
}
