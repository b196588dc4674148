package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Learn `k` merges from `corpus`. Stops early if no pair remains. */
  def train(corpus: DataFrame, textCol: String, k: Int): Seq[Merge] = {
    var words  = wordFreqs(corpus, textCol).localCheckpoint()
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
          .localCheckpoint()
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
