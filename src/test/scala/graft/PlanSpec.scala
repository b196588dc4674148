package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Headline, Parity}

/** Plan-shape regressions: the properties that make these queries viable at
  * 100 TB must stay in the physical plan — filters pushed into the parquet
  * scan, column pruning, broadcast for dim joins, TakeOrderedAndProject for
  * top-k (never a global sort materialization).
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(q: graft.queries.Q): String =
    q.run(spark, TestSpark.sf0001).queryExecution.executedPlan.toString

  test("h1: shipdate filter reaches the parquet scan, schema pruned") {
    val p = plan(Headline.h1)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "untouched columns must be pruned from the scan")
    assert(p.contains("partial_sum"), "aggregation must be partial (map-side) before the exchange")
  }

  test("u6: numeric predicate pushed down, 3-column read schema") {
    val p = plan(Parity.u6)
    assert(p.contains("LessThanOrEqual(l_discount,0.05)"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_discount:double>"))
  }

  test("h2: dimension filter pushed, joins broadcast, top-k is TakeOrdered") {
    val p = plan(Headline.h2)
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("h3: both dims broadcast — no shuffle for the joins") {
    val p = plan(Headline.h3)
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2)
  }

  test("h5: global top-k compiles to TakeOrderedAndProject, 2-column scan") {
    val p = plan(Headline.h5)
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"))
  }

  test("grep scan: filter applied in scan stage, no join/shuffle before agg") {
    val p = plan(Parity.g2)
    assert(!p.contains("Join"))
    // single partial→final count, no other exchanges
    assert(p.contains("partial_count") || p.contains("HashAggregate"))
  }

  test("bucketed tables sort-merge join without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      // The in-memory catalog forgets tables across JVMs but the warehouse
      // directory persists; clear the physical locations or saveAsTable fails
      // on the second run with a non-empty-location error.
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      Seq("b_orders", "b_customer").foreach { t =>
        val d = new java.io.File(wh, t)
        if (d.exists()) {
          def del(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(del)
            f.delete()
          }
          del(d)
        }
      }
      Tables.orders(spark, TestSpark.sf0001)
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
      Tables.customer(spark, TestSpark.sf0001)
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), org.apache.spark.sql.functions.col("o_custkey") === org.apache.spark.sql.functions.col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle; plan was:\n${plan.take(1500)}")
      assert(j.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("h16: correlated scalar subquery decorrelates to aggregate+join") {
    val p = plan(Headline.h16)
    assert(!p.contains("ScalarSubquery"),
      "Catalyst must decorrelate the subquery (no per-row subquery execution)")
    assert(p.contains("Join"), "decorrelated form is an aggregate joined back to the fact table")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
  }

  test("h13: full outer join runs over pre-aggregated sides") {
    val p = plan(Headline.h13)
    assert(p.contains("FullOuter"))
    // Both join inputs are aggregates (one row per key) — the join never sees
    // raw fact rows. partial_count on each side + final = at least 4 aggs.
    assert("HashAggregate".r.findAllIn(p).size >= 4, s"expected pre-agg sides; plan:\n${p.take(1200)}")
  }

  test("h12: left outer join keeps zero-order customers (plan + result sanity)") {
    val p = plan(Headline.h12)
    assert(p.contains("LeftOuter"))
    val rows = Headline.h12.run(spark, TestSpark.sf0001)
    assert(rows.count() == Tables.customer(spark, TestSpark.sf0001).count(),
      "left outer must preserve every customer")
  }

  test("f2 scale mechanism: repartitionByRange plans a parallel RangePartitioning exchange") {
    import org.apache.spark.sql.functions._
    // The ntile form in Parity.f2 is harness-only (single-task window for the
    // oracle hash); THIS is the engine path for fair range partitioning.
    val df = Tables.documents(spark, TestSpark.sf0001)
      .repartitionByRange(8, col("doc_id"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("rangepartitioning"),
      s"repartitionByRange must plan a RangePartitioning exchange; plan:\n${p.take(800)}")
    // And the resulting partitions are range-disjoint and ordered — the
    // "fair partitions" observable, computed in parallel (no global window).
    val parts = df
      .select(spark_partition_id().as("pid"), col("doc_id"))
      .groupBy("pid")
      .agg(min("doc_id").cast("long").as("lo"), max("doc_id").cast("long").as("hi"),
        count(lit(1)).as("n"))
      .orderBy("pid")
      .collect()
    assert(parts.length > 1, "500 docs over 8 range partitions must use multiple partitions")
    parts.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(1),
        s"partitions must be range-disjoint: ${a.mkString(",")} vs ${b.mkString(",")}")
      case _ => ()
    }
    // Fairness: no empty partitions, and no partition owns everything.
    assert(parts.forall(_.getLong(3) > 0))
    assert(parts.map(_.getLong(3)).max < 500)
  }

  test("partitioned layout: scan prunes partitions via PartitionFilters") {
    import org.apache.spark.sql.functions._
    // THE layout lever at 100 TB: data written partitioned by a hot filter
    // column means a filtered scan never opens the other partitions at all.
    val dir = java.nio.file.Files.createTempDirectory("partpq").toString
    Tables.events(spark, TestSpark.sf0001)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter(col("event_type") === "error")
      .select("event_id")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), s"expected partition pruning; plan:\n${p.take(800)}")
    assert(p.contains("error"))
    val expected = Tables.events(spark, TestSpark.sf0001)
      .filter(col("event_type") === "error").count()
    assert(df.count() == expected)
  }

  test("h18/h19: CUBE and GROUPING SETS are one Expand + one aggregate pass, not N scans") {
    for (q <- Seq(Headline.h18, Headline.h19)) {
      val p = plan(q)
      assert(p.contains("Expand"), s"${q.name}: grouping sets must plan via Expand")
      assert("Scan parquet".r.findAllIn(p).size == 1,
        s"${q.name}: one scan feeds every grouping set; plan:\n${p.take(800)}")
      assert(p.contains("partial_count") || p.contains("HashAggregate"),
        s"${q.name}: Expand must feed a partial aggregate")
    }
  }

  test("h20: pivot plans as ONE conditional-count aggregate, no per-status scan") {
    val p = plan(Headline.h20)
    assert("Scan parquet".r.findAllIn(p).size == 1, s"pivot must not rescan per value; plan:\n${p.take(800)}")
    assert(!p.contains("Expand"), "pinned-value pivot needs no Expand — plain conditional aggregation")
    assert(p.contains("ReadSchema: struct<o_orderstatus:string,o_orderpriority:string>"),
      "only the two pivot columns may be read")
  }

  test("x_ngram_freq: top-k is TakeOrdered over a partial-agg'd explode, 1-column scan") {
    val p = plan(graft.queries.Extensions.ngramFreq)
    assert(p.contains("TakeOrderedAndProject"), "limit+orderBy must compile to top-k, not a global sort")
    assert(p.contains("Generate explode"), "bigrams expand inside the scan stage")
    assert(p.contains("ReadSchema: struct<text:string>"), "only text may be read")
  }

  test("x_text_langid/quality: single projection, kernel runs once per row (no when-tree blowup)") {
    // The round-2 scale-killer regression pin: the langid projection must be
    // a bounded-size expression (one lang_id call), not 2^5 duplicated
    // intersect pipelines; row cost must stay ~constant.
    val p = graft.queries.Extensions.textLangId.run(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert("lang_id".r.findAllIn(p).size <= 2, s"lang_id must appear once in the projection:\n${p.take(600)}")
    assert(!p.contains("array_intersect"), "per-language intersect pipelines must be gone")
    val q = graft.queries.Extensions.textQuality.run(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert("token_counts".r.findAllIn(q).size <= 2,
      s"text must be tokenized once, not per output column:\n${q.take(600)}")
  }

  test("h21: bucketized interval join plans an equi hash join, never a nested loop") {
    val p = plan(Headline.h21)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must bucketize to an equi join; plan:\n${p.take(1000)}")
    assert(p.contains("Join"), "bucket equi-join expected")
    // And the result equals the naive theta join on the same inputs.
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"), col("event_type"))
    val w = ev.filter(col("event_type") === "error" && col("event_id") % 50 === 0)
      .select(col("event_id").as("window_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 2 hours")).as("w_end"))
    val naive = ev.select(col("ts")).alias("e")
      .join(w, col("e.ts") >= col("w_start") && col("e.ts") < col("w_end"))
      .groupBy("window_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bucketized = Headline.h21.run(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketized == naive, "bucketized interval join must equal the naive theta join")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // One giant key + a spread tail against a small right side, broadcast
    // disabled so it must sort-merge — the shape that stalls a cluster on
    // one straggler task unless AQE splits the skewed partition.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    try {
      val left = spark.range(200000)
        .select(when(col("id") % 10 === 0, 0L).otherwise(col("id")).as("k"),
          concat(lit("payload-"), col("id")).as("v"))
      val right = spark.range(100).select(col("id").as("k"), lit("dim").as("d"))
      val joined = left.join(right, "k").select(col("k")) // small rows for collect
      joined.collect() // collect() runs THIS dataset's QueryExecution → AQE finalizes it
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the skewed join split; final plan:\n${finalPlan.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salted wordcount equals plain wordcount") {
    val plain  = Parity.u2.run(spark, TestSpark.sf0001).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Parity.u2salted.run(spark, TestSpark.sf0001).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }

  test("custom SQL functions are registered via GraftExtensions") {
    val r = spark.sql("SELECT rolling_hash('abc') AS h, simhash64(array('a','b')) AS s, " +
      "cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS c, " +
      "size(minhash_sig(array('x'), 16)) AS k, size(word_shingles('a b c d', 2)) AS w, " +
      "size(id_pairs(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(3 AS BIGINT)))) AS p, " +
      "lang_id('the a of and cat') AS l, deflate_ratio('aaaaaaaaaaaaaaaaaaaaaaaa') AS d, " +
      "c4_line_clean('Keep this full line.\nno').n_kept AS c4").collect()(0)
    assert(r.getDouble(2) == 1.0)
    assert(r.getInt(3) == 16)
    assert(r.getInt(4) == 3)
    assert(r.getInt(5) == 3)
    assert(r.getString(6) == "en")
    assert(r.getDouble(7) < 1.0)
    assert(r.getInt(8) == 1)
  }

  test("x_sample_stratified: rank filter becomes WindowGroupLimit (per-partition top-N heaps)") {
    val p = plan(graft.queries.Extensions.sampleStratified)
    assert(p.contains("WindowGroupLimit"),
      s"row_number<=N must rewrite to WindowGroupLimit so no full per-stratum sort materializes:\n$p")
  }

  test("x_quality_perplexity: model probe broadcasts, corpus scan reads only id+text") {
    val p = plan(graft.queries.Extensions.qualityPerplexity)
    assert(p.contains("BroadcastHashJoin"),
      s"the Heaps-law vocabulary model must broadcast — a shuffled model join re-shuffles the corpus:\n$p")
    assert(!p.contains("CartesianProduct"), "scalars ride a broadcast 1-row frame, never a cartesian")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "corpus scan must prune to the two referenced columns")
    assert(p.contains("partial_count"), "per-doc aggregation must map-side-combine before its exchange")
  }

  test("x_dsir_weights: fixed-size bucket model broadcasts onto the raw corpus") {
    val p = plan(graft.queries.Extensions.dsirWeights)
    assert(p.contains("BroadcastHashJoin"),
      s"the 256-bucket model must broadcast onto the scoring pass:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("x_semdedup: centroids broadcast; per-cluster cap is WindowGroupLimit, pairs stay fused") {
    val p = plan(graft.queries.Extensions.semDedup)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"k-row centroid assignment must be a broadcast nested-loop, not a shuffle:\n$p")
    assert(p.contains("WindowGroupLimit"),
      "the maxBucketSize row_number cap must rewrite to WindowGroupLimit (no full per-cluster sort)")
    assert(p.toLowerCase.contains("cosinepairsexpr"),
      s"within-cluster scoring must ride the fused kernel — no per-pair verify joins:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("x_tfidf_keywords: df model broadcasts back onto tf; top-k is WindowGroupLimit") {
    val p = plan(graft.queries.Extensions.tfidfKeywords)
    assert(p.contains("BroadcastHashJoin"),
      s"the Heaps-law df model must broadcast onto the tf frame:\n$p")
    assert(p.contains("WindowGroupLimit"),
      "row_number<=k must rewrite to WindowGroupLimit (per-partition top-k heaps, no full per-doc sort)")
    assert(!p.contains("CartesianProduct"), "the 1-row N scalar rides a broadcast, never a cartesian")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "corpus scan must prune to the two referenced columns")
  }

  test("x_embedding_quantize: pure map-side projection — zero exchanges") {
    // The registry form appends an orderBy for the oracle dump; the operator
    // itself must plan with ZERO exchanges (projection + generate only).
    val unsorted = graft.functions.AnnSearch
      .quantizeInt8(Tables.embeddings(spark, TestSpark.sf0001), "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!unsorted.contains("Exchange"),
      s"unsorted quantize must plan with ZERO exchanges (map-side only):\n$unsorted")
    assert(unsorted.contains("Generate"), "posexplode should plan as Generate")
  }

  test("x_ann_int8: queries broadcast, integer dot rides the codegen kernel, top-k is WindowGroupLimit") {
    val p = plan(graft.queries.Extensions.annInt8)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the query set must broadcast (non-equi self-exclusion join) — corpus never shuffles for scoring:\n$p")
    assert(p.toLowerCase.contains("int8dot"),
      s"scoring must ride the codegen'd int8_dot kernel, not an interpreted zip_with/aggregate:\n${p.take(800)}")
    assert(p.contains("WindowGroupLimit"),
      "rank<=k must rewrite to WindowGroupLimit (per-partition top-k heaps)")
    assert(!p.contains("CartesianProduct"))
  }

  test("runtime bloom-filter join pruning: selective dim filter injects might_contain on the fact side") {
    import org.apache.spark.sql.functions._
    // Shuffle-join regime (broadcast off) with thresholds at 0 so the tiny
    // test tables qualify; at real scale the defaults (10 MB creation side)
    // gate the same rewrite. The injected bloom filter semi-join-reduces the
    // fact rows BEFORE the shuffle — the standard 100 TB join-pruning lever.
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val o = Tables.orders(spark, TestSpark.sf0001)
      val c = Tables.customer(spark, TestSpark.sf0001).filter(col("c_mktsegment") === "BUILDING")
      val p = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(sum(col("o_totalprice")).as("s"))
        .queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"selective dim side must inject a bloom filter onto the fact scan:\n${p.take(1200)}")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  test("approx mode: exact percentile rewrites to quantile sketch only when opted in, schema unchanged") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    def q() = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"))
    val exactSchema = q().schema
    val exact = q().orderBy("l_returnflag").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(!q().queryExecution.optimizedPlan.toString.contains("percentile_approx"))
    spark.conf.set("spark.graft.approx.percentile", "true")
    try {
      val plan = q().queryExecution.optimizedPlan.toString
      assert(plan.contains("percentile_approx"),
        s"opt-in must rewrite exact percentile to the sketch; plan:\n${plan.take(600)}")
      assert(q().schema == exactSchema, "rewrite must not change the result schema")
      val approx = q().orderBy("l_returnflag").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      exact.foreach { case (k, v) =>
        assert(math.abs(approx(k) - v) <= math.max(1.0, 0.05 * math.abs(v)),
          s"approx p50 for $k strayed: ${approx(k)} vs $v")
      }
    } finally spark.conf.set("spark.graft.approx.percentile", "false")
  }

  test("approx mode: count(DISTINCT) rewrites to HLL++ only when opted in") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    def q() = li.agg(count_distinct(col("l_partkey")).as("n"))
    val exact = q().collect()(0).getLong(0)
    assert(!q().queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
    spark.conf.set("spark.graft.approx.countDistinct", "true")
    try {
      val plan = q().queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"),
        s"opt-in must rewrite exact distinct to HLL++; plan:\n${plan.take(600)}")
      // No Expand/distinct shuffle in the physical plan — ONE sketch pass.
      val phys = q().queryExecution.executedPlan.toString
      assert(!phys.contains("Expand"), "HLL++ form must not plan the distinct Expand")
      val approx = q().collect()(0).getLong(0)
      assert(math.abs(approx - exact).toDouble / exact <= 0.15,
        s"approx=$approx strayed from exact=$exact beyond 3x rsd")
      // SQL path goes through the same optimizer rule.
      li.createOrReplaceTempView("li_approx")
      val sqlPlan = spark.sql("SELECT count(DISTINCT l_partkey) FROM li_approx")
        .queryExecution.optimizedPlan.toString
      assert(sqlPlan.contains("approx_count_distinct"))
    } finally spark.conf.set("spark.graft.approx.countDistinct", "false")
  }

  test("h27/h28: the event log shuffles on user_id exactly once") {
    for (q <- Seq(Headline.h27, Headline.h28)) {
      val p = plan(q)
      val n = "hashpartitioning\\(user_id".r.findAllIn(p).size
      assert(n == 1, s"${q.name}: expected 1 user_id exchange, found $n in:\n${p.take(1500)}")
    }
  }

  test("x_cdc_apply: latest-state is a hash aggregate, not a per-key window sort") {
    val p = plan(graft.queries.Extensions.cdcApply)
    assert(!p.contains("Window"), "compaction must not plan a window")
    assert(p.contains("partial_max_by") || p.contains("max_by"),
      "latest-state must ride the max_by aggregate")
  }

  test("x_ohlc_bars: open/close ride the hash aggregate — no window sort") {
    val p = plan(graft.queries.Extensions.ohlcBars)
    assert(!p.contains("Window"), "OHLC must not plan a window")
    assert(p.contains("min_by") && p.contains("max_by"),
      "open/close must ride min_by/max_by in the aggregate")
  }

  test("x_histogram: one partial->final count, filter-free bucket arithmetic") {
    val p = plan(graft.queries.Extensions.histogramQ)
    assert(p.contains("partial_count") || p.contains("HashAggregate"))
    assert(!p.contains("Join"))
  }

  test("x_fuzzy_join_edit: blocked join is equi; only the 1-row stats join nests") {
    val p = plan(graft.queries.Extensions.fuzzyJoinEdit)
    assert(!p.contains("CartesianProduct"),
      s"blocking key must make the fuzzy join equi:\n${p.take(1500)}")
    // Exactly ONE BroadcastNestedLoopJoin is allowed: the 1-row breach-count
    // frame crossing the 1-row stats frame (the scalar-broadcast pattern the
    // registry permits for model-sized sides). The variant candidate join
    // itself must stay a hash join.
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      s"only the scalar stats join may nest:\n${p.take(1500)}")
    assert(p.contains("HashJoin"), "the variant-blocked candidate join must be equi")
  }

  test("x_boolean_search: term set broadcast, top-k term pick is TakeOrdered") {
    val p = plan(graft.queries.Indexing.booleanSearch)
    assert(p.contains("BroadcastHashJoin"), "2-term set must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-df terms must be a heap, not a sort")
    assert(!p.contains("SortMergeJoin"), "the corpus side must never shuffle for the term join")
  }

  test("x_countmin: sketch cells broadcast to the probes; no corpus-sized join") {
    val p = plan(graft.queries.Indexing.countMin)
    assert(p.contains("BroadcastHashJoin"), "128-cell sketch must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("x_winnowing: kgram window and fingerprint pair join are both capped hash shapes") {
    val p = plan(graft.queries.Indexing.winnowing)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "fingerprint blocking must keep the pair join equi")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      "the winnow min must ride a window, not a self-join")
  }

  test("x_inverted_index: posting head capped by row_number BEFORE collect_list") {
    val p = plan(graft.queries.Indexing.invertedIndex)
    // The window (cap) must appear below the collect_list aggregate in the
    // plan string — the order guarantees no unbounded posting buffer.
    val win = p.indexOf("row_number")
    val agg = p.indexOf("collect_list")
    assert(win >= 0 && agg >= 0 && win > agg,
      s"cap window must sit beneath the collect aggregate (win@$win agg@$agg)")
  }

  test("x_scd2: repeat-collapse, interval lead, and ordering share ONE user exchange") {
    val p = plan(graft.queries.Indexing.scd2)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"SCD2 must not reshuffle per window:\n${p.take(1200)}")
  }

  test("x_scd2_lookup: point-in-time lookup rides the native as-of exec") {
    val p = plan(graft.queries.Indexing.scd2Lookup)
    assert(p.contains("AsOfJoinExec") || p.contains("AsOfJoin"),
      s"SCD2 lookup must use the single-pass as-of operator, not an interval join:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("x_triangle_count: oriented wedge join stays equi; no cartesian closure") {
    val p = plan(graft.queries.Indexing.triangleCount)
    assert(!p.contains("CartesianProduct"),
      s"degree orientation must keep every join equi:\n${p.take(1200)}")
    // The only BNLJ allowed is the 1-row triangles x wedges scalar cross.
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1)
  }

  test("x_countmin: one corpus scan — cell hashes ride a posexplode, not a d-way union") {
    val p = plan(graft.queries.Indexing.countMin)
    assert("Scan parquet".r.findAllIn(p).size <= 2, // corpus once + truth once
      s"cells and probes must not rescan per hash row:\n${p.take(1200)}")
  }

  test("x_resample_ffill: grid fill rides the native as-of exec, no day-x-event join") {
    val p = plan(graft.queries.Indexing.resampleFfill)
    assert(p.contains("AsOfJoin"),
      s"forward fill must be an as-of merge, not an interval join:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("x_bloom_index: probe bits broadcast against the sparse file-bit table") {
    val p = plan(graft.queries.Indexing.bloomIndex)
    assert(p.contains("BroadcastHashJoin"), "30-row probe-bit set must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("x_sorted_neighborhood: one global sort carries all w-1 lead columns") {
    val p = plan(graft.queries.Indexing.sortedNeighborhood)
    assert(!p.contains("Join"), "window pairs must come from leads, not a self-join")
  }

  test("x_zonemap: pruning decision is arithmetic over the file-stats frame, no rescan") {
    val p = plan(graft.queries.Indexing.zoneMap)
    // One scan of lineitem only: the second aggregation reads the file-stats
    // aggregate, not the table again.
    assert("Scan parquet".r.findAllIn(p).size <= 1, s"must scan lineitem once:\n${p.take(1200)}")
  }

  test("x_audio_features: decode is map-side — the only exchange is the presentation sort") {
    val p = plan(graft.queries.Media.audioFeatures)
    assert("Exchange".r.findAllIn(p).size == 1,
      s"payload bytes must never shuffle; got:\n${p.take(1500)}")
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
      "batched typed decode stage expected")
  }

  test("x_k_anonymity: 3-column scan, partial aggregation before the exchange") {
    val p = plan(graft.queries.Governance.kAnonymity)
    assert(p.contains("ReadSchema: struct<c_nationkey:int,c_acctbal:double,c_mktsegment:string>"),
      s"quasi-identifier + sensitive columns only:\n${p.take(1200)}")
    assert(p.contains("partial_count"), "map-side combine expected")
  }

  test("x_unpivot: melt is a row-local Expand on top of the one aggregation") {
    val p = plan(graft.queries.Governance.unpivotMetrics)
    assert(p.contains("Expand"), "native unpivot should plan as Expand")
    assert(!p.contains("Join"), "no join in a reshape")
  }

  test("h32: salted join shuffles on (suppkey, salt) — no broadcast of the modeled big dim") {
    val p = plan(Headline.h32)
    assert(p.contains("SortMergeJoin"), s"big-dim scenario must shuffle, not broadcast:\n${p.take(800)}")
    assert(!p.contains("BroadcastHashJoin"), "the merge hint must hold against auto-broadcast")
    assert(p.contains("salt"), "the salt must be part of the join key")
  }

  test("x_equidepth_histogram: sampled boundaries, bucket count one partial→final agg") {
    val p = plan(graft.queries.Governance.equidepthHistogram)
    // boundary phase reads only the sampled rows: the sample predicate must
    // reach the parquet scan feeding percentile_cont
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey)]") || p.contains("l_orderkey"),
      s"sample filter must exist on the boundary branch:\n${p.take(1200)}")
    // the full-data bucket count is map-side partial before its ONE exchange
    assert(p.contains("partial_count"), "bucket count must combine map-side")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 9-value boundary row must broadcast, never shuffle the data against it")
  }

  test("x_link_prediction: existing-edge exclusion is a broadcast anti join, not a filter scan") {
    val p = plan(graft.queries.Indexing.linkPrediction)
    assert(p.contains("LeftAnti"), "non-edge filtering must be an anti join")
    assert(!p.contains("BroadcastNestedLoopJoin"), "no quadratic pair enumeration")
  }

  test("h33: bucketed join reads co-located buckets — zero exchanges below the join") {
    val p = plan(Headline.h33)
    assert(p.contains("SortMergeJoin"), s"merge hint must hold:\n${p.take(800)}")
    assert("SelectedBucketsCount".r.findAllIn(p).size == 2,
      s"both scans must be bucketed:\n${p.take(1500)}")
    // the ONLY hash exchange is the final aggregation's (the orderBy adds a
    // range exchange); the join itself ships zero bytes
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"join must be exchange-free:\n${p.take(1500)}")
  }

  test("x_dpp_prune: fact scan carries a dynamic partition pruning subquery") {
    val p = plan(graft.queries.Governance.dppPrune)
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"partition filter must be injected at runtime from the dim side:\n${p.take(1500)}")
  }

  test("x_entity_resolution: candidate pairs come from a block-key equi-join, never a cross join") {
    val p = plan(graft.queries.Extensions.entityResolution)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"blocking must bound the pair space:\n${p.take(1200)}")
  }

  test("h34: runtime Bloom filter from the filtered dim lands on the fact side") {
    val p = plan(Headline.h34)
    assert(p.contains("might_contain"),
      s"InjectRuntimeFilter must plant a Bloom predicate on the fact scan side:\n${p.take(2000)}")
    assert(p.contains("bloom_filter_agg"),
      "the filter must be BUILT from the filtered dim keys (one model-sized aggregate)")
    assert(p.contains("SortMergeJoin"), "merge hint (too-big-to-broadcast dim) must hold")
  }

  test("x_group_split: audits aggregate on hash keys — no quadratic pair shapes") {
    val p = plan(graft.queries.Extensions.groupSplit)
    assert(!p.contains("CartesianProduct"),
      "only 1-row audit frames may cross-join (Spark plans those as broadcast loops)")
    assert("Exchange hashpartitioning".r.findAllIn(p).size >= 2,
      "source-span and content-leak audits must each be a hash-partitioned aggregate")
  }

  test("x_match_recognize: one hash exchange feeds the DFA; scan reads 4 columns") {
    val p = plan(graft.queries.Patterns.matchRecognize)
    // repartition(user_id) is the only hash exchange; the top-level orderBy
    // adds a range exchange and nothing else reshuffles the log
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"pattern depth must never add shuffles:\n${p.take(1500)}")
    assert(p.contains("MapPartitions"), "the DFA must run as a linear partition scan")
    assert(!p.contains("props"), "untouched columns must be pruned from the scan")
  }

  test("x_skyline: both phases are MapPartitions prunes, no quadratic join anywhere") {
    val p = plan(graft.queries.Patterns.skyline)
    assert("MapPartitions".r.findAllIn(p).size >= 2,
      s"local prune + candidate collapse must both be partition scans:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "dominance must never be evaluated as an all-pairs join")
  }

  test("x_simjoin_prefix: candidates from a prefix-token equi-join, never a cross join") {
    val p = plan(graft.queries.Patterns.simjoinPrefix)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix filtering must bound the pair space:\n${p.take(1200)}")
  }

  test("x_phrase_search: postings are pruned against the broadcast phrase before any join") {
    val p = plan(graft.queries.Indexing.phraseSearch)
    assert(p.contains("BroadcastExchange"),
      s"the 1-row phrase must broadcast, not shuffle:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"),
      "position alignment must be an equi-join on (doc, aligned position)")
  }

  test("x_collocations_pmi: top-20 is TakeOrdered, counts aggregate map-side first") {
    val p = plan(graft.queries.Analytics.collocationsPmi)
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-k must never materialize a global sort:\n${p.take(1200)}")
    assert(p.contains("partial_count"), "bigram/unigram counts must combine map-side")
  }

  test("x_mad_outliers / x_acf: order book collapses to daily partials, no quadratic shape") {
    for (q <- Seq(graft.queries.Analytics.madOutliers, graft.queries.Analytics.acf)) {
      val p = plan(q)
      assert(p.contains("partial_sum"),
        s"${q.name}: the (priority, day) collapse must combine map-side:\n${p.take(1200)}")
      assert(!p.contains("CartesianProduct"),
        s"${q.name}: nothing here may be an all-pairs join")
    }
  }

  test("x_ktruss: triangle wedges come from equi-joins, never a cross join") {
    val p = plan(graft.queries.Analytics.ktruss)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"wedge enumeration must join on the shared endpoint:\n${p.take(1200)}")
  }

  test("x_chi2_independence: fact-fact equi-join then 15 schema-bounded cells") {
    val p = plan(graft.queries.Analytics.chi2Independence)
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count"), "the cell counts must combine map-side")
    assert(!p.contains("o_totalprice"), "untouched columns must be pruned from the scan")
  }

  test("x_benford_digits: one pruned scan, map-side digit counts") {
    val p = plan(graft.queries.Analytics.benfordDigits)
    assert(p.contains("ReadSchema: struct<o_totalprice:double>"),
      s"the scan must read only the audited column:\n${p.take(1200)}")
    assert(p.contains("partial_count"))
  }

  test("x_kaplan_meier: per-user partials feed a single-task calendar fold") {
    val p = plan(graft.queries.Analytics.kaplanMeier)
    assert(p.contains("MapPartitions"), "the survival fold must be a linear partition scan")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("props"), "untouched columns must be pruned from the events scan")
  }

  test("x_skipgram_cooc: pairs from in-array transforms — no positional self-join") {
    val p = plan(graft.queries.Analytics.skipgramCooc)
    assert(!p.contains("Join"),
      s"window pairs must be generated inside the token array:\n${p.take(1200)}")
    assert(p.contains("TakeOrderedAndProject") && p.contains("partial_count"))
  }

  test("x_ab_cuped: 1-row pooled stats broadcast over the user frame, no shuffle of scalars") {
    val p = plan(graft.queries.Analytics.abCuped)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the pooled-stats 1-row frame must broadcast:\n${p.take(1200)}")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "per-user aggregation must combine map-side")
  }

  test("x_runs_test / x_forecast_backtest / x_seasonal_decompose: daily collapse is map-side") {
    for (q <- Seq(graft.queries.Analytics.runsTest,
        graft.queries.Analytics.forecastBacktest,
        graft.queries.Analytics.seasonalDecompose)) {
      val p = plan(q)
      assert(p.contains("partial_sum") || p.contains("partial_count"),
        s"${q.name}: the per-day collapse must combine map-side:\n${p.take(1200)}")
      assert(!p.contains("CartesianProduct"), s"${q.name}: no all-pairs shape")
    }
  }

  /** First argument of every windowspecdefinition in the plan. Partition
    * columns print first WITHOUT a sort direction, so a first arg carrying
    * ASC/DESC (or going straight to the frame) marks an UNPARTITIONED
    * window — the single-task funnel tools/window_lint.py machine-catches
    * over EXPLAIN.md; these pins catch it at test time for the queries the
    * r13 verdict rewrote.
    */
  private def unpartitionedWindowFirstArgs(p: String): Seq[String] =
    "windowspecdefinition\\(([^,)]+)".r.findAllMatchIn(p).map(_.group(1).trim)
      .filter(a => a.startsWith("specifiedwindowframe")
        || a.endsWith("NULLS FIRST") || a.endsWith("NULLS LAST"))
      .toSeq

  test("x_rfm_segmentation: no unpartitioned window over the user frame (two-phase ntile)") {
    val p = plan(graft.queries.Indexing.rfmSegmentation)
    val bad = unpartitionedWindowFirstArgs(p).filterNot(_.startsWith("__p#"))
    assert(bad.isEmpty,
      s"every global window must be a config-sized __p offset frame, got: $bad\n${p.take(1500)}")
    assert(p.contains("RangePartitioning") || p.contains("rangepartitioning"),
      "the three quintile ranks must range-partition the user frame")
  }

  test("x_vocab_coverage / x_compaction_plan: rank and prefix sum are two-phase, not one task") {
    for (q <- Seq(graft.queries.Extensions.vocabCoverage,
        graft.queries.Extensions.compactionPlan)) {
      val p = plan(q)
      val bad = unpartitionedWindowFirstArgs(p).filterNot(_.startsWith("__p#"))
      assert(bad.isEmpty,
        s"${q.name}: only the __p offset frame may window unpartitioned, got: $bad")
    }
  }

  test("rank-stats family: histograms/ranks are two-phase; model-sized sides broadcast") {
    for (q <- graft.queries.RankStats.qs) {
      val p = plan(q)
      val bad = unpartitionedWindowFirstArgs(p).filterNot(_.startsWith("__p#"))
      assert(bad.isEmpty,
        s"${q.name}: only the __p offset frame may window unpartitioned, got: $bad")
      assert(!p.contains("SortMergeJoin"),
        s"${q.name}: every join side here is model-sized (offsets/bounds/totals) — must broadcast")
    }
  }
}
