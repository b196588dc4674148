package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed Spark `Aggregator` — the
  * SURVEY §2.6 "AggregateByKey UDF → Aggregator[IN,BUF,OUT]" surface, applied
  * to an operator a 100 TB corpus pipeline actually needs: find all tokens
  * with frequency > n/k in ONE pass with O(k) state per partition, mergeable
  * map-side (the reference's stateful operator protocol cannot partial-merge
  * at all — its count state is a whole map journaled per tuple).
  *
  * Guarantee (standard Misra-Gries): every item with true frequency > n/k is
  * in the output, and each reported lower-bound count is within n/k of the
  * true count. The output is a candidate set, not exact counts — pair with a
  * second exact pass over the candidates when exact counts matter.
  */
object HeavyHitters {

  // Immutable map buffer: encodes as a native MapType(string,long) struct —
  // compact, shuffle-comparable partial state (the kryo form shipped opaque
  // java-serialized blobs per partial merge). k-sized persistent-map updates
  // are O(1) with small constants, so the per-token cost stays flat.
  type Buf = Map[String, Long]

  /** Decrement-all step: admit `item` (weight w), shedding one unit of every
    * tracked counter when the table is full — the Misra-Gries invariant.
    */
  private def admit(buf: Buf, item: String, w: Long, k: Int): Buf = {
    val cur = buf.getOrElse(item, 0L)
    if (cur > 0L || buf.size < k) buf.updated(item, cur + w)
    else {
      // decrement every counter by w (bounded by the smallest), drop zeros
      val dec     = math.min(w, buf.values.min)
      val reduced = buf.iterator
        .map { case (i, v) => (i, v - dec) }
        .filter(_._2 > 0L)
        .toMap
      val rem = w - dec
      if (rem > 0 && reduced.size < k) reduced.updated(item, rem) else reduced
    }
  }

  /** Typed aggregator: `k` counter slots ⇒ finds all items with frequency
    * > n/k. Output sorted by (count desc, item) for determinism.
    */
  def sketch(k: Int): Aggregator[String, Buf, Seq[(String, Long)]] =
    new Aggregator[String, Buf, Seq[(String, Long)]] {
      override def zero: Buf = Map.empty

      override def reduce(buf: Buf, item: String): Buf = admit(buf, item, 1L, k)

      // Merge = replay b's counters into a with their weights; Misra-Gries
      // sketches merge exactly this way and keep the n/k error bound.
      override def merge(a: Buf, b: Buf): Buf =
        b.foldLeft(a) { case (acc, (item, w)) => admit(acc, item, w, k) }

      override def finish(buf: Buf): Seq[(String, Long)] =
        buf.toSeq.sortBy { case (item, cnt) => (-cnt, item) }

      override def bufferEncoder: Encoder[Buf] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
      override def outputEncoder: Encoder[Seq[(String, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
    }

  /** Weighted form of [[sketch]]: each input is an (item, weight) pair and
    * the decrement-all step sheds `weight` units at once — exactly the merge
    * rule, applied at reduce time. This is the second-stage aggregate of
    * [[graft.streaming.RainStorm.trendingTopKSketch]]: stage one's exact
    * per-(window, token) counts feed in as weights, so the sketch holds O(k)
    * state per window instead of one row per distinct token. With
    * `k >= |vocabulary|` no counter ever sheds and the counts stay exact
    * (the parity gate in TrendingTopKSpec).
    */
  def weightedSketch(k: Int): Aggregator[(String, Long), Buf, Seq[(String, Long)]] =
    new Aggregator[(String, Long), Buf, Seq[(String, Long)]] {
      override def zero: Buf = Map.empty

      override def reduce(buf: Buf, in: (String, Long)): Buf = admit(buf, in._1, in._2, k)

      override def merge(a: Buf, b: Buf): Buf =
        b.foldLeft(a) { case (acc, (item, w)) => admit(acc, item, w, k) }

      override def finish(buf: Buf): Seq[(String, Long)] =
        buf.toSeq.sortBy { case (item, cnt) => (-cnt, item) }

      override def bufferEncoder: Encoder[Buf] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
      override def outputEncoder: Encoder[Seq[(String, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
    }
}
