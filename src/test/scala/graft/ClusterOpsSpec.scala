package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{ClusterOps, DedupOps}

/** Duplicate clustering (connected components) + contamination scan. */
class ClusterOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ClusterOps
      .connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("connected components: two components, transitive chain") {
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connected components: long path converges (O(log n) rounds)") {
    // A 64-node path is the worst case for min-label propagation (diameter
    // 63); large-star/small-star must close it within the default maxIter.
    val got = components((0L until 63L).map(i => (i, i + 1)))
    assert(got.size == 64 && got.values.forall(_ == 0L))
  }

  test("connected components: non-convergence at maxIter throws, never silently wrong") {
    // At a cut-off fixpoint min(v) is only the current best label, not the
    // component minimum — the operator must refuse, not return it.
    import spark.implicits._
    val path = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      ClusterOps.connectedComponents(path, "a", "b", maxIter = 1).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("connected components: duplicate/reversed/self edges collapse") {
    val got = components(Seq((2L, 1L), (1L, 2L), (2L, 2L), (3L, 1L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("dedupClusters: transitive near-dups keep exactly one canonical doc") {
    import spark.implicits._
    // a~b and b~c are near-dups (one-word tail edits); d is unrelated.
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (10L, base + " alpha"),
      (11L, base + " beta"),
      (12L, base + " alpha gamma"),
      (13L, "completely different text about nothing shared at all here")
    ).toDF("doc_id", "text")
    val got = ClusterOps
      .dedupClusters(docs, "doc_id", "text", shingleN = 3, k = 64, bands = 16, threshold = 0.7)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(_._1)
    assert(got === Seq((10L, 10L, 1), (11L, 10L, 0), (12L, 10L, 0), (13L, 13L, 1)))
  }

  test("keepBestInClusters: highest-score doc kept even when it is not the smallest id") {
    import spark.implicits._
    // Same planted cluster as above, plus per-doc quality scores where the
    // LAST member (id 12) is the best — first-wins would keep 10, the
    // quality policy must keep 12. Singleton 13 always keeps.
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (10L, base + " alpha", 5L),
      (11L, base + " beta", 7L),
      (12L, base + " alpha gamma", 9L),
      (13L, "completely different text about nothing shared at all here", 1L)
    ).toDF("doc_id", "text", "quality")
    val got = ClusterOps
      .keepBestInClusters(docs, "doc_id", "text", "quality",
        shingleN = 3, k = 64, bands = 16, threshold = 0.7)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(_._1)
    assert(got === Seq((10L, 10L, 0), (11L, 10L, 0), (12L, 10L, 1), (13L, 13L, 1)))
  }

  test("keepBestInClusters: score ties fall back to smallest id; one keep per cluster") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"v$i").mkString(" ")
    val docs = Seq(
      (20L, base + " x", 3L),
      (21L, base + " y", 3L),
      (22L, base + " z", 3L)
    ).toDF("doc_id", "text", "quality")
    val got = ClusterOps
      .keepBestInClusters(docs, "doc_id", "text", "quality",
        shingleN = 3, k = 64, bands = 16, threshold = 0.7)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2)))
      .sortBy(_._1)
    assert(got === Seq((20L, 1), (21L, 0), (22L, 0)),
      "equal scores must keep exactly the smallest id")
  }

  test("contamination: shared 5-grams flagged, clean docs absent, eval side broadcast") {
    import spark.implicits._
    val leak = "the quick brown fox jumps over the lazy dog"
    val train = Seq(
      (1L, s"prefix words then $leak and a tail"),
      (2L, "totally clean training document with no overlap whatsoever"),
      (3L, leak) // exact benchmark text
    ).toDF("doc_id", "text")
    val eval = Seq((100L, leak)).toDF("doc_id", "text")

    val df  = DedupOps.contamination(train, eval, "doc_id", "text", n = 5)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // leak has 9 words -> 5 distinct 5-grams, all shared by doc 1 and doc 3.
    assert(got === Seq((1L, 1L, 5L), (3L, 1L, 5L)))
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "eval side must broadcast — corpus side must not shuffle before the aggregation")
  }
}
