package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Layout.LineageOps

/** Link-graph analytics beyond the clustering in [[ClusterOps]]: centrality
  * over an edge list, DataFrame-native (no driver-side graph, no adjacency
  * materialization). The reference has no graph surface at all; this follows
  * the original PageRank recipe (Page, Brin, Motwani, Winograd, "The PageRank
  * Citation Ranking", Stanford InfoLab 1999) re-expressed as the standard
  * join-aggregate iteration every MapReduce-era paper uses.
  */
object GraphOps {

  /** PageRank over a directed edge list, `iters` fixed iterations, ALL
    * arithmetic in scaled integers (total rank mass = `scale`, floor division
    * at every step) — bit-identical on any engine that floors, which is what
    * lets the registry oracle replay the full iteration in SQL. Dangling
    * nodes (no out-edges) leak their mass per round — the classic
    * simplification — and the 0.15 damping base term keeps every node
    * positive. Returns (node BIGINT, rank_scaled BIGINT).
    *
    * Shape per iteration: edges ⋈ ranks on src (hash join on node id),
    * contributions partial→final SUM on dst, left join back to the node
    * universe — at most |E| rows per shuffle, lineage truncated per round
    * via localCheckpoint (the [[ClusterOps.connectedComponents]] discipline).
    * The only driver-side values are |V| and the derived base term — model
    * state, not data. At cluster scale, pre-bucketing edges by src pins one
    * side of every iteration's join so only the (|V|-sized) rank frame moves.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 5,
      scale: Long = 1000000000000L
  ): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .truncateLineage()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .truncateLineage()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ew  = e.join(deg, "src")

    val n        = nodes.count()
    val baseTerm = (15L * scale) / (100L * n)

    var ranks = nodes.withColumn("r", lit(scale / n))
    for (_ <- 1 to iters) {
      val contribs = ew
        .join(ranks, col("src") === col("node"))
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(baseTerm) + expr("(85 * coalesce(s, 0)) div 100")).as("r"))
        .truncateLineage()
    }
    ranks.select(col("node"), col("r").as("rank_scaled"))
  }

  /** Personalized PageRank (Page et al. '99 §6; Jeh/Widom WWW'03): the
    * teleport vector is uniform over a SEED set rather than all nodes, so
    * mass concentrates in the seeds' neighborhood — the "related to THESE
    * items" recommendation primitive, where global PageRank answers only
    * "important overall". Same integer-scaled fixed-iteration recipe as
    * [[pageRank]] (truncating division, bit-exact cross-engine): r0 puts
    * scale/|S| on each seed, and each round's base term is
    * 15·scale/(100·|S|) on seeds, 0 elsewhere. Execution shape identical:
    * one contribs exchange per round over checkpointed lineage.
    */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seedPred: Column,
      iters: Int = 5,
      scale: Long = 1000000000000L
  ): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .truncateLineage()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .withColumn("is_seed", seedPred.cast("boolean"))
      .truncateLineage()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ew  = e.join(deg, "src")

    val ns = nodes.filter(col("is_seed")).count()
    require(ns > 0, "personalized PageRank needs a non-empty seed set")
    val baseTerm = (15L * scale) / (100L * ns)

    var ranks = nodes.select(col("node"),
      when(col("is_seed"), lit(scale / ns)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to iters) {
      val contribs = ew
        .join(ranks, col("src") === col("node"))
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (when(col("is_seed"), lit(baseTerm)).otherwise(lit(0L)) +
            expr("(85 * coalesce(s, 0)) div 100")).as("r"))
        .truncateLineage()
    }
    ranks.select(col("node"), col("r").as("rank_scaled"))
  }

  /** BFS shortest-hop layers from `source` over a directed edge list,
    * bounded to `maxHops` levels: per round, the FRONTIER (nodes first
    * reached last round) joins the edge list and a min-aggregation folds
    * new reachings in — shuffle volume per round is frontier × out-degree,
    * never all paths (the path-enumeration blowup is the classic recursive
    * mistake; the level-synchronous form keeps state at one row per reached
    * node). Returns (node, hops) for every node within `maxHops`. Lineage
    * truncated per round as in [[pageRank]].
    */
  /** Single-source shortest paths over WEIGHTED edges — `rounds` synchronous
    * Bellman-Ford relaxations, so the result is the exact min-cost distance
    * among paths of ≤ `rounds` edges (the full SSSP when rounds ≥ graph
    * diameter). Each round is one frontier⋈edges shuffle + a node-keyed min
    * — the Pregel cost model; `localCheckpoint` truncates lineage exactly as
    * in [[bfsLayers]]/[[pageRank]] so round r never rescans rounds 0..r-1.
    * Parallel edges collapse to their min weight up front (the only
    * semantics a relaxation can ever use).
    */
  def ssspWeighted(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      source: Long,
      rounds: Int
  ): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"),
        col(wCol).cast("long").as("w"))
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .truncateLineage()
    var dist = e.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0L).as("dist"))
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(e, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.union(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .truncateLineage()
    }
    dist
  }

  /** k-core peeling (Seidman, "Network structure and minimum degree", Social
    * Networks 1983): `rounds` synchronous peel steps, each removing every
    * node whose degree in the SURVIVING subgraph is < k. With rounds ≥ the
    * peel depth this is the exact k-core; with fixed `rounds` it is the
    * deterministic bounded form the registry oracles (the [[ssspWeighted]]
    * fixed-rounds precedent). Input must be the SYMMETRIC edge list (both
    * directions present, no self-loops) so out-degree == degree; the method
    * re-dedups defensively. Returns (node, deg) — degree inside the final
    * surviving subgraph.
    *
    * Shape per round: one degree aggregation (partial→final count on src)
    * plus two semi-joins filtering the edge frame to surviving endpoints —
    * at most |E| rows shuffled per round, lineage truncated via
    * localCheckpoint exactly as in [[pageRank]]. No driver-side state at
    * all: survivors never leave the cluster.
    */
  def kCore(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      rounds: Int
  ): DataFrame = {
    var e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .truncateLineage()
    for (_ <- 1 to rounds) {
      val survivors = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("node"))
      e = e
        .join(survivors.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(survivors.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .truncateLineage()
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
  }

  /** k-truss peeling (Cohen, "Trusses: cohesive subgraphs for social network
    * analysis", 2008): `rounds` synchronous peel steps, each removing every
    * edge supported by fewer than k−2 triangles INSIDE the surviving
    * subgraph. With rounds ≥ the peel depth this is the exact k-truss; with
    * fixed `rounds` it is the deterministic bounded form the registry
    * oracles (the [[kCore]] fixed-rounds precedent). The truss is the
    * edge-strength analogue of the core: it drops bridges and hub spokes
    * that k-core keeps, which is why community detection prefers it.
    *
    * Input: undirected edges in either orientation — each pair is
    * CANONICALIZED to (min, max) and de-duped defensively (a reversed
    * duplicate merges instead of silently dropping; self-loops drop).
    * Per round: one triangle enumeration — wedges via a
    * self-join on the lower endpoint closed by a semi-join (each triangle
    * materializes exactly once as u<v<w) — then a 3-way edge projection
    * aggregated into per-edge support, then a semi-join filter. Lineage is
    * truncated via localCheckpoint as in [[pageRank]]. Returns the
    * surviving edges with their support in the FINAL subgraph (0 when a
    * survivor's triangles all died in the last peel and rounds stopped
    * short of the fixpoint).
    */
  def truss(
      edges: DataFrame,
      loCol: String,
      hiCol: String,
      k: Int,
      rounds: Int
  ): DataFrame = {
    def support(e: DataFrame): DataFrame = {
      val t = e.as("a")
        .join(e.as("b"), col("a.lo") === col("b.lo") && col("a.hi") < col("b.hi"))
        .select(col("a.lo").as("u"), col("a.hi").as("v"), col("b.hi").as("w"))
        .join(e.select(col("lo").as("v"), col("hi").as("w")), Seq("v", "w"), "left_semi")
      t.select(col("u").as("lo"), col("v").as("hi"))
        .union(t.select(col("u").as("lo"), col("w").as("hi")))
        .union(t.select(col("v").as("lo"), col("w").as("hi")))
        .groupBy("lo", "hi").agg(count(lit(1)).as("sup"))
    }
    var e = edges
      .select(col(loCol).cast("long").as("a"), col(hiCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
      .distinct()
      .truncateLineage()
    for (_ <- 1 to rounds) {
      e = e
        .join(support(e).filter(col("sup") >= k - 2), Seq("lo", "hi"), "left_semi")
        .truncateLineage()
    }
    e.join(support(e), Seq("lo", "hi"), "left")
      .select(col("lo"), col("hi"), coalesce(col("sup"), lit(0L)).as("sup"))
  }

  def bfsLayers(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      source: Long,
      maxHops: Int
  ): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .truncateLineage()
    var dist = e.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0L).as("hops"))
    for (h <- 1 to maxHops) {
      val frontier = dist.filter(col("hops") === (h - 1))
      val next = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("node"), lit(h.toLong).as("hops"))
      dist = dist.union(next)
        .groupBy(col("node")).agg(min(col("hops")).as("hops"))
        .truncateLineage()
    }
    dist
  }
}
