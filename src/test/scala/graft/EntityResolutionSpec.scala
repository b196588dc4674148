package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Extensions

/** Planted-fixture check for the 4-stage entity-resolution pipeline: the
  * fixture plants a TRANSITIVE chain (a~b and b~c match at edit distance 1
  * but a~c is distance 2 — only the clustering stage can merge all three),
  * a cross-block near-identical pair (must NOT match: blocking is part of
  * the semantics), and a same-block distance-2 pair (below the match
  * threshold). The registry oracle replays the pipeline row-level on the
  * synthetic corpus; this spec pins the linkage LOGIC on a graph where the
  * correct answer is hand-derivable.
  */
class EntityResolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("transitive merge within a block; blocking and threshold both exclude") {
    import spark.implicits._
    val dir = "/tmp/graft_er_fixture"
    Seq(
      // chain cluster: 19~18 lev1, 18~38 lev1, 19~38 lev2 → transitive {10,11,12}
      (10L, "Customer#000000019", 1, "AUTOMOBILE", 1.00),
      (11L, "Customer#000000018", 1, "AUTOMOBILE", 2.00),
      (12L, "Customer#000000038", 1, "AUTOMOBILE", 3.50),
      // lev-1 pair split across blocks (different nation): must not link
      (20L, "Customer#000000555", 2, "AUTOMOBILE", 10.00),
      (21L, "Customer#000000556", 3, "AUTOMOBILE", 10.00),
      // same block, lev 2: below the ≤1 match threshold
      (30L, "Customer#000000700", 1, "BUILDING", 5.00),
      (31L, "Customer#000000777", 1, "BUILDING", 5.00)
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val out = Extensions.entityResolution.run(spark, dir).collect()
    assert(out.length == 1, s"exactly the planted chain must survive, got ${out.toSeq}")
    val r = out.head
    assert(r.getAs[Long]("cluster_rep") == 10L, "canonical record is the min member key")
    assert(r.getAs[Long]("n_members") == 3L, "transitivity must pull in the distance-2 endpoint")
    assert(r.getAs[Long]("bal_cents") == 650L, "survivorship balance is the exact member sum")
  }

  test("pigeonhole candidates are lossless: pipeline equals the quadratic definition on real data") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf0001
    // quadratic per-(nation, segment) reference — the oracle's definition,
    // computed here in Spark so the equivalence is engine-internal
    val c = graft.Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long").as("k"), col("c_name").as("nm"),
        col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
    val a = c.select(col("k").as("xk"), col("nm").as("xnm"), col("nat"), col("seg"))
    val b = c.select(col("k").as("yk"), col("nm").as("ynm"), col("nat"), col("seg"))
    val quadPairs = a.join(b, Seq("nat", "seg"))
      .filter(col("xk") < col("yk") && levenshtein(col("xnm"), col("ynm")) <= 1)
      .select(col("xk"), col("yk")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(quadPairs.nonEmpty, "fixture scale must contain at least one match pair")
    val out = Extensions.entityResolution.run(spark, sf).collect()
    // pipeline output is cluster-level; rebuild its pair support lower bound:
    // every reported cluster must be reproducible from the quadratic pairs'
    // connected components (sizes and reps must agree exactly)
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    quadPairs.foreach { case (x, y) =>
      adj.getOrElseUpdate(x, scala.collection.mutable.Set(x)) += y
      adj.getOrElseUpdate(y, scala.collection.mutable.Set(y)) += x
    }
    def component(s0: Long): Set[Long] = {
      val seen = scala.collection.mutable.Set(s0); var frontier = List(s0)
      while (frontier.nonEmpty) {
        val nxt = frontier.flatMap(n => adj.getOrElse(n, Set.empty[Long]).toSeq).filterNot(seen)
        seen ++= nxt; frontier = nxt
      }
      seen.toSet
    }
    val comps = adj.keys.map(component).toSet.filter(_.size >= 2)
    val expected = comps.map(cc => (cc.min, cc.size.toLong)).toMap
    val got = out.map(r => r.getAs[Long]("cluster_rep") -> r.getAs[Long]("n_members")).toMap
    assert(got == expected,
      s"pigeonhole pipeline must reproduce the quadratic definition; got $got expected $expected")
  }

  test("incremental ER: joins the CLUSTER label not the matched node, mints new entities, leaves misses alone") {
    import spark.implicits._
    val dir = "/tmp/graft_er_inc_fixture"
    Seq(
      // base (k % 7 != 0): resolved cluster {10, 11} with rep 10
      (10L, "Customer#000000019", 1, "AUTOMOBILE", 1.0),
      (11L, "Customer#000000018", 1, "AUTOMOBILE", 1.0),
      // delta (k % 7 == 0):
      // 14 matches base member 11 (lev 1) but NOT rep 10 (lev 2) — must still
      // land on rep 10 via 11's frozen cluster label
      (14L, "Customer#000000038", 1, "AUTOMOBILE", 1.0),
      // 21/28 match only each other — new multi-member entity, rep = min key
      (21L, "Customer#000000555", 2, "AUTOMOBILE", 1.0),
      (28L, "Customer#000000556", 2, "AUTOMOBILE", 1.0),
      // 35 matches nothing — new singleton entity
      (35L, "Customer#000000700", 3, "BUILDING", 1.0)
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val got = Extensions.erIncremental.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("delta_k"), r.getAs[Long]("rep"), r.getAs[Long]("is_existing"))).toSet
    assert(got == Set((14L, 10L, 1L), (21L, 21L, 0L), (28L, 21L, 0L), (35L, 35L, 0L)),
      s"assignment cases wrong: $got")
  }

  test("streaming entity assignment equals the batch formula across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._

    // frozen base catalog: cluster {10, 11} resolved to label 10
    val base = Seq(
      (10L, "Customer#000000019", 1, "AUTOMOBILE"),
      (11L, "Customer#000000018", 1, "AUTOMOBILE")
    ).toDF("label_src", "nm", "nat", "seg")
      .select(lit(10L).as("label"), col("nm"), col("nat"), col("seg"))

    val t1 = java.sql.Timestamp.valueOf("2026-01-01 12:00:00")
    val in = MemoryStream[(Long, String, Int, String, java.sql.Timestamp)]
    val out = graft.streaming.RainStorm.erAssignStream(
      in.toDF.toDF("k", "nm", "nat", "seg", "ts"), base)
    val q = out.writeStream.outputMode("append").format("memory").queryName("er_stream").start()
    try {
      // batch 1: 14 matches member 11 via its non-rep name; 35 misses
      in.addData((14L, "Customer#000000038", 1, "AUTOMOBILE", t1),
                 (35L, "Customer#000000700", 3, "BUILDING", t1))
      q.processAllAvailable()
      // batch 2: 21 matches BOTH members (two candidate passes agree — the
      // windowed min must not double-count)
      in.addData((21L, "Customer#000000017", 1, "AUTOMOBILE", t1))
      q.processAllAvailable()
      // sentinel far past watermark+window closes the window
      in.addData((999L, "Customer#000000999", 9, "ZZZ", java.sql.Timestamp.valueOf("2026-01-02 12:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.sql("SELECT delta_k, rep, matched_existing FROM er_stream WHERE delta_k < 999")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((14L, 10L, 1L), (35L, 35L, 0L), (21L, 10L, 1L)),
      s"streaming assignments wrong: $got")
  }
}
