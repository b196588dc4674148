package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed `Aggregator`:
  * keep the k smallest DISTINCT hash values of a stream; the kth-smallest
  * order statistic estimates the distinct count as (k−1)·M/kth for hashes
  * uniform on [0, M) (Bar-Yossef et al., RANDOM 2002 — the "KMV"/"bottom-k"
  * estimator, rel. error ~1/√k with a 2-independent hash family).
  *
  * Why this sketch alongside Spark's HLL++ (`x_approx_distinct_sketch`):
  * the state is a plain sorted list of integers under an exactly-specified
  * universal hash ([[VecMath.hash61]]), so the WHOLE pipeline — hash,
  * bottom-k state, kth-min, estimate — is replayable in ANSI SQL and the
  * sketch query is row-level oracle-able, which an opaque HLL register
  * blob can never be. Scale shape: O(k) state per partition, map-side
  * partial merge (union → distinct → take k), one tiny row to the driver;
  * no distinct shuffle of the corpus. Below k distinct values the sketch
  * IS the exact distinct set ('filled' < k ⇒ estimate = filled, exact).
  */
object KmvSketch {

  /** The Mersenne modulus and the registry's fixed hash parameters — the
    * SAME literals appear in the x_distinct_kmv DuckDB oracle; change them
    * only together.
    */
  val M: Long = (1L << 61) - 1
  val A: Long = 1803442709493370165L
  val B: Long = 784588716359925081L

  final case class KmvSummary(kthMin: Long, filled: Long)

  /** Merge two ascending distinct sequences, keep the k smallest. */
  private def mergeK(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] = {
    val out = new scala.collection.mutable.ArrayBuffer[Long](k)
    var i = 0; var j = 0
    while (out.size < k && (i < a.size || j < b.size)) {
      val next =
        if (j >= b.size || (i < a.size && a(i) <= b(j))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      if (out.isEmpty || out.last != next) out += next
    }
    out.toSeq
  }

  /** Bottom-k aggregator over pre-hashed values (feed [[VecMath.hash61]]
    * output). Buffer = ascending distinct hash values, ≤ k of them.
    */
  def sketch(k: Int): Aggregator[Long, Seq[Long], KmvSummary] =
    new Aggregator[Long, Seq[Long], KmvSummary] {
      override def zero: Seq[Long] = Vector.empty

      override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
        if (buf.size >= k && h >= buf.last) buf // common case: not in bottom k
        else {
          val i = {
            // binary search for insertion point
            var lo = 0; var hi = buf.size
            while (lo < hi) { val m = (lo + hi) >>> 1; if (buf(m) < h) lo = m + 1 else hi = m }
            lo
          }
          if (i < buf.size && buf(i) == h) buf // already tracked
          else {
            val ins = (buf.take(i) :+ h) ++ buf.drop(i)
            if (ins.size > k) ins.dropRight(1) else ins
          }
        }

      override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = mergeK(a, b, k)

      override def finish(buf: Seq[Long]): KmvSummary =
        KmvSummary(if (buf.isEmpty) -1L else buf.last, buf.size.toLong)

      override def bufferEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
      override def outputEncoder: Encoder[KmvSummary] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KmvSummary]()
    }
}
