package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Indexing

/** Link-prediction scoring invariants and RRF fusion arithmetic — the
  * registry oracles verify row-level equality; these pin the math's internal
  * consistency so a future rewrite can't silently change score semantics.
  */
class HybridRetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("link prediction: candidates are non-edges with consistent scores") {
    val out = Indexing.linkPrediction.run(spark, sf).collect()
    assert(out.nonEmpty)
    val edges = Tables.events(spark, sf)
      .select((col("user_id") % 211).as("a"), (col("event_id") % 211).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { r =>
      val u = r.getAs[Long]("u"); val w = r.getAs[Long]("w")
      assert(u < w, "canonical pair order")
      assert(!edges.contains((u, w)), "predicted pairs must not already be edges")
      val cn = r.getAs[Long]("cn")
      assert(cn >= 1)
      assert(r.getAs[Long]("jaccard_ppm") <= 1000000L)
      // every common neighbor of a non-edge pair has degree >= 2
      assert(r.getAs[Long]("ra_ppm") <= cn * 500000L)
    }
    // descending under the documented total order
    val keys = out.map(r => (-r.getAs[Long]("cn"), -r.getAs[Long]("ra_ppm"),
      r.getAs[Long]("u"), r.getAs[Long]("w"))).toSeq
    assert(keys == keys.sorted, "top-20 must follow the (cn, ra, u, w) order")
  }

  test("RRF fusion: score is exactly the reciprocal-rank sum of the two lists") {
    val out = Indexing.hybridSearchRrf.run(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val rb = r.getAs[Long]("rank_bm25"); val rt = r.getAs[Long]("rank_tfidf")
      assert(rb >= 0 && rb <= 20 && rt >= 0 && rt <= 20)
      assert(rb > 0 || rt > 0, "a fused doc must appear in at least one list")
      val expect = (if (rb > 0) 1000000L / (60 + rb) else 0L) +
        (if (rt > 0) 1000000L / (60 + rt) else 0L)
      assert(r.getAs[Long]("rrf_ppm") == expect)
    }
    // a doc in both lists must outrank a doc present only at the same single
    // rank: fused scores are monotone in list membership
    val both = out.filter(r => r.getAs[Long]("rank_bm25") > 0 && r.getAs[Long]("rank_tfidf") > 0)
    val one  = out.filter(r => r.getAs[Long]("rank_bm25") == 0 || r.getAs[Long]("rank_tfidf") == 0)
    if (both.nonEmpty && one.nonEmpty) {
      assert(both.map(_.getAs[Long]("rrf_ppm")).max >= one.map(_.getAs[Long]("rrf_ppm")).max)
    }
  }
}
