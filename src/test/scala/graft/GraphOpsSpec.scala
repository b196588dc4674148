package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraphOps

/** Closed-form checks for the integer PageRank: on a star graph every
  * quantity is computable by hand, so the test pins exact values, not
  * tolerances (the registry's x_pagerank oracle replays the full iteration
  * in SQL; this spec guards the operator against refactors independently of
  * the synthetic event graph).
  */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pageRank on a 4-node star: leaves hold exactly the damping base, center dominates") {
    import spark.implicits._
    val scale = 1000000000000L
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val r = GraphOps.pageRank(edges, "src", "dst", iters = 5, scale = scale)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap

    assert(r.size == 4)
    // Leaves have no in-edges: rank = baseTerm from iteration 1 onward.
    val baseTerm = (15L * scale) / (100L * 4)
    assert(Seq(1L, 2L, 3L).forall(r(_) == baseTerm))
    // Center: base + floor(85 * 3*floor(leafRank/1) / 100) at the fixpoint
    // reached by iteration 2 (leaf ranks stop changing after iteration 1).
    val center = baseTerm + (85L * (3L * baseTerm)) / 100L
    assert(r(0L) == center, s"center=${r(0L)} expected=$center")
    assert(r(0L) > r(1L))
  }

  test("bfsLayers: shortest hops on a known path+shortcut graph, bounded frontier") {
    import spark.implicits._
    // 0→1→2→3 chain plus shortcut 0→3: node 3 must label 1 (not 3), and a
    // node beyond maxHops must be absent.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = GraphOps.bfsLayers(edges, "src", "dst", source = 0L, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
    val capped = GraphOps.bfsLayers(edges, "src", "dst", source = 0L, maxHops = 2)
      .collect().map(r => r.getLong(0)).toSet
    assert(!capped.contains(5L), "nodes beyond maxHops must be absent")
  }

  test("kCore: K4 plus a pendant — the clique survives k=3 with exact degrees, the pendant peels") {
    import spark.implicits._
    // K4 on {0,1,2,3} (every degree 3) + pendant 4 attached to 0.
    val und = Seq((0L,1L),(0L,2L),(0L,3L),(1L,2L),(1L,3L),(2L,3L),(0L,4L))
    val edges = (und ++ und.map(e => (e._2, e._1))).toDF("src", "dst")
    val got = GraphOps.kCore(edges, "src", "dst", k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
      s"4 must peel and degrees must be IN-core degrees, got $got")
  }

  test("kCore: cascading peel empties a path graph, and bounded rounds stop mid-cascade") {
    import spark.implicits._
    // Path 0-1-2-3-4: 2-core is empty, but the peel cascades from the ends —
    // one round only removes {0,4}. Bounded rounds are the defined semantics
    // (the SSSP fixed-rounds precedent), so rounds=1 must KEEP {1,2,3}.
    val und = Seq((0L,1L),(1L,2L),(2L,3L),(3L,4L))
    val edges = (und ++ und.map(e => (e._2, e._1))).toDF("src", "dst")
    val full = GraphOps.kCore(edges, "src", "dst", k = 2, rounds = 4)
    assert(full.count() == 0L, "the 2-core of a path is empty once the cascade completes")
    val one = GraphOps.kCore(edges, "src", "dst", k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(one == Set(1L, 2L, 3L), s"one synchronous round removes only the endpoints, got $one")
  }

  test("pageRank total mass stays under scale (dangling leak is one-sided)") {
    import spark.implicits._
    // 0→1→2, 2 dangling: mass leaks, never inflates.
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val total = GraphOps.pageRank(edges, "src", "dst", iters = 4)
      .agg(org.apache.spark.sql.functions.sum("rank_scaled")).head().getLong(0)
    assert(total <= 1000000000000L)
    assert(total > 0L)
  }
}
