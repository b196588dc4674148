package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Layout.LineageOps

/** Distributed BPE vocabulary induction (Sennrich et al., ACL 2016 — the
  * tokenizer-training step of an LLM data pipeline; [[QualityLM.vocabCoverage]]
  * audits the SIZE of such a vocabulary, this learns its CONTENT).
  *
  * Scale shape — the published word-dict formulation, which is what makes
  * BPE trainable at corpus scale at all: the corpus is touched exactly ONCE
  * (the word-frequency aggregation, whose output is Heaps-law-sized —
  * O(corpus^~0.5) rows — not corpus-sized). Every merge round then runs on
  * that word-vocabulary frame only: one adjacent-pair count aggregation
  * (weighted by word frequency), one driver-side argmax of a SINGLE row
  * (the same per-round-scalar pattern as [[ClusterOps]]' convergence
  * fingerprint — it is the loop control, not data movement), and one
  * map-side [[BpeApplyExpr]] merge application. `localCheckpoint` per round
  * truncates the lineage so k rounds cost k·O(vocab), not a 2^k plan.
  *
  * Determinism: the argmax orders by (count DESC, left ASC, right ASC) — a
  * total order, so the learned merge table is identical across runs,
  * partitionings, and cluster sizes.
  */
object BpeTrain {

  /** One merge learned per round: (round, left, right, pair_count). */
  final case class Merge(round: Int, left: String, right: String, pairCount: Long)

  /** (word, wc, syms) frame: whitespace word frequencies over `textCol`
    * with each word's initial symbol sequence (chars + `</w>`). The ONE
    * corpus-wide pass.
    */
  def wordFreqs(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .select(explode(split(col(textCol), "[ \n]")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .withColumn("syms", concat(split(col("w"), ""), array(lit("</w>"))))

  /** Adjacent-pair counts of the CURRENT symbol sequences, weighted by word
    * frequency — the per-round (and round-0 oracle) aggregation. Runs over
    * the vocabulary frame, never the corpus.
    */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("wc"), explode(zip_with(
        slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
        slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("lsym"), col("p.r").as("rsym"))
      .agg(sum(col("wc")).as("pair_count"))

  /** Learn `k` merges from `corpus`. Stops early if no pair remains.
    *
    * HYBRID loop drive: the corpus-scale work — the ONE word-frequency
    * aggregation — is always distributed; the merge LOOP then runs wherever
    * the collapsed word dict lives best. When the dict is driver-sized
    * (`maxDriverWords`, default 500k rows — the per-character String symbol
    * buffers cost ~0.5 KB/word worst-case, so the default stays within a
    * few hundred MB of driver heap; raise only with driver memory to
    * match), it is collected
    * once and the k rounds run in-memory ([[trainLocal]]): a 32k-vocab
    * training is thousands of hash-map passes over a small array, seconds,
    * instead of 32k Spark jobs. Above the threshold the loop stays
    * distributed at one pair-count job per merge — correct at any dict
    * size, with the explicit k-jobs cost bound. Both paths share the exact
    * total order (count DESC, then UTF-8-byte-ascending left, right), so
    * the learned table is identical whichever side of the threshold runs —
    * BpeTrainSpec pins the equality.
    */
  def train(
      corpus: DataFrame, textCol: String, k: Int, maxDriverWords: Long = 500000L
  ): Seq[Merge] = {
    val words = wordFreqs(corpus, textCol).truncateLineage()
    if (words.count() <= maxDriverWords) {
      val dict = words.select(col("w"), col("wc")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      trainLocal(dict, k)
    } else trainDistributed(words, k)
  }

  /** The distributed merge loop: one vocab-frame pair-count aggregation +
    * one map-side [[NativeFns.bpe_apply]] per round. O(k) Spark jobs.
    */
  private def trainDistributed(words0: DataFrame, k: Int): Seq[Merge] = {
    var words  = words0
    val merges = Seq.newBuilder[Merge]
    var round  = 0
    var done   = false
    while (round < k && !done) {
      val top = pairCounts(words)
        .orderBy(desc("pair_count"), asc("lsym"), asc("rsym"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val best = top(0)
        val (l, r) = (best.getString(0), best.getString(1))
        merges += Merge(round, l, r, best.getLong(2))
        words = words
          .withColumn("syms", NativeFns.bpe_apply(col("syms"), l, r))
          .truncateLineage()
        round += 1
      }
    }
    merges.result()
  }

  /** UTF-8 byte order — Spark's `asc` on strings compares UTF8String bytes,
    * so the driver-local argmax must tie-break the same way (Java String
    * compareTo differs above U+E000).
    */
  private def u8lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Driver-local merge loop over a collected `(word, freq)` dictionary:
    * same pair counts, same argmax total order, same greedy resume-at-i+2
    * merge pass as the distributed round — byte-identical merge tables.
    * Cost per round is one pass over the symbol arrays (the dict, not the
    * corpus), so k=1000 trains in seconds where the per-merge-job
    * distributed loop would schedule 1000 jobs.
    */
  def trainLocal(dict: Seq[(String, Long)], k: Int): Seq[Merge] = {
    val syms = dict.map { case (w, _) =>
      val b = new scala.collection.mutable.ArrayBuffer[String](w.length + 1)
      // Iterate CODE POINTS, not UTF-16 units: Spark's split(w, "") keeps
      // surrogate pairs whole, and the two paths must learn identical merge
      // tables for non-BMP text (emoji, CJK extensions).
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b += "</w>"
      b
    }.toArray
    val wcs    = dict.map(_._2).toArray
    val merges = Seq.newBuilder[Merge]
    var round  = 0
    var done   = false
    while (round < k && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < syms.length) {
        val s  = syms(wi)
        val wc = wcs(wi)
        var i = 0
        while (i < s.length - 1) {
          counts.merge((s(i), s(i + 1)), wc, (a, b) => a + b)
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) done = true
      else {
        var bestP: (String, String) = null
        var bestC = 0L
        counts.forEach { (p, c) =>
          val better = bestP == null || c > bestC ||
            (c == bestC && (u8lt(p._1, bestP._1) ||
              (p._1 == bestP._1 && u8lt(p._2, bestP._2))))
          if (better) { bestP = p; bestC = c }
        }
        val (l, r) = bestP
        merges += Merge(round, l, r, bestC)
        var wj = 0
        while (wj < syms.length) {
          val s = syms(wj)
          if (s.length > 1) {
            val m = new scala.collection.mutable.ArrayBuffer[String](s.length)
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == l && s(i + 1) == r) { m += l + r; i += 2 }
              else { m += s(i); i += 1 }
            }
            syms(wj) = m
          }
          wj += 1
        }
        round += 1
      }
    }
    merges.result()
  }

  /** The learned merge table as a (k-row) DataFrame for registry surfaces. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.round.toLong, m.left, m.right, m.pairCount))
      .toDF("round", "lsym", "rsym", "pair_count")
  }
}
