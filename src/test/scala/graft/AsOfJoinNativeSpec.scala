package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin
import graft.queries.Headline

/** The custom whole-operator as-of join (AsOfJoinPlan → AsOfJoinStrategy →
  * AsOfJoinExec) must agree bit-for-bit with the composed union+window form
  * on real data, honor the inclusive/left-outer/null edge semantics, and
  * produce the declared physical shape (one exchange per side, none when
  * inputs are pre-partitioned).
  */
class AsOfJoinNativeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 1.0),
    ("A", ts("2024-01-01 10:05:00"), 2.0),
    ("B", ts("2024-01-01 10:03:00"), 9.0)
  ).toDF("sym", "qt", "px")

  private lazy val trades = Seq(
    ("A", ts("2024-01-01 09:59:00"), 100L), // before any quote -> null
    ("A", ts("2024-01-01 10:00:00"), 101L), // == quote time -> inclusive match 1.0
    ("A", ts("2024-01-01 10:04:59"), 102L), // between -> 1.0
    ("A", ts("2024-01-01 10:30:00"), 103L), // after both -> 2.0
    ("B", ts("2024-01-01 10:04:00"), 104L), // -> 9.0
    ("C", ts("2024-01-01 10:04:00"), 105L), // key never quoted -> null
    (null, ts("2024-01-01 10:04:00"), 106L) // null key -> null
  ).toDF("sym", "tt", "id")

  test("asof native: inclusive lookback, left outer, null-key semantics") {
    val out = AsOfJoin
      .native(trades, "sym", "tt", quotes.withColumnRenamed("sym", "qsym"), "qsym", "qt")
      .select($"id", $"px")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out === Map(100L -> null, 101L -> 1.0, 102L -> 1.0, 103L -> 2.0,
                       104L -> 9.0, 105L -> null, 106L -> null))
  }

  test("asof native: null right time rows are dropped, null left time never matches") {
    val q = Seq(("A", Option.empty[java.sql.Timestamp], 7.0),
                ("A", Some(ts("2024-01-01 10:00:00")), 1.0)).toDF("qsym", "qt", "px")
      .select($"qsym", $"qt", $"px")
    val t = Seq(("A", Some(ts("2024-01-01 10:01:00")), 1L),
                ("A", Option.empty[java.sql.Timestamp], 2L)).toDF("sym", "tt", "id")
    val out = AsOfJoin.native(t, "sym", "tt", q, "qsym", "qt")
      .select($"id", $"px")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out === Map(1L -> 1.0, 2L -> null))
  }

  test("asof native: tolerance rejects stale matches (merge_asof parity)") {
    val q = quotes.withColumnRenamed("sym", "qsym")
    val out = AsOfJoin
      .native(trades, "sym", "tt", q, "qsym", "qt",
        tolerance = Some(java.time.Duration.ofMinutes(10)))
      .select($"id", $"px")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    // trade 103 at 10:30 is 25 min after quote 2.0 (10:05) -> stale, null;
    // everything else is within 10 min and keeps its match
    assert(out === Map(100L -> null, 101L -> 1.0, 102L -> 1.0, 103L -> null,
                       104L -> 9.0, 105L -> null, 106L -> null))
  }

  test("asof native forward: earliest at-or-after match, inclusive boundary, left outer") {
    val out = AsOfJoin
      .native(trades, "sym", "tt", quotes.withColumnRenamed("sym", "qsym"), "qsym", "qt",
        direction = "forward")
      .select($"id", $"px")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    // 100 @09:59 -> first quote at 10:00; 101 @10:00 -> inclusive 1.0;
    // 102 @10:04:59 -> 10:05's 2.0; 103 @10:30 -> nothing ahead -> null;
    // 104 B@10:04 -> B's only quote is behind -> null; 105/106 -> null.
    assert(out === Map(100L -> 1.0, 101L -> 1.0, 102L -> 2.0, 103L -> null,
                       104L -> null, 105L -> null, 106L -> null))
  }

  test("asof native forward: tolerance bounds rt - lt, boundary inclusive") {
    val out = AsOfJoin
      .native(trades, "sym", "tt", quotes.withColumnRenamed("sym", "qsym"), "qsym", "qt",
        tolerance = Some(java.time.Duration.ofMinutes(1)), direction = "forward")
      .select($"id", $"px")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    // 100: 10:00 is exactly 60s ahead -> boundary-inclusive match; 102: 1s ahead;
    // everything else unchanged or null.
    assert(out === Map(100L -> 1.0, 101L -> 1.0, 102L -> 2.0, 103L -> null,
                       104L -> null, 105L -> null, 106L -> null))
  }

  test("asof native nearest: min |Δt| wins on either side, tolerance applies to the winner") {
    val out = AsOfJoin
      .native(trades, "sym", "tt", quotes.withColumnRenamed("sym", "qsym"), "qsym", "qt",
        direction = "nearest")
      .select($"id", $"px")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    // 100 @09:59: only the future 10:00 exists -> 1.0; 102 @10:04:59: 1s forward
    // beats 299s backward -> 2.0; 103 @10:30: only the past 10:05 -> 2.0.
    assert(out === Map(100L -> 1.0, 101L -> 1.0, 102L -> 2.0, 103L -> 2.0,
                       104L -> 9.0, 105L -> null, 106L -> null))

    val bounded = AsOfJoin
      .native(trades, "sym", "tt", quotes.withColumnRenamed("sym", "qsym"), "qsym", "qt",
        tolerance = Some(java.time.Duration.ofMinutes(2)), direction = "nearest")
      .select($"id", $"px")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    // 103's nearest (25 min back) now exceeds tolerance -> null; others survive.
    assert(bounded === Map(100L -> 1.0, 101L -> 1.0, 102L -> 2.0, 103L -> null,
                           104L -> 9.0, 105L -> null, 106L -> null))
  }

  test("asof native nearest: exact distance tie resolves backward (merge_asof rule)") {
    val t = Seq(("A", ts("2024-01-01 10:02:30"), 1L)).toDF("sym", "tt", "id")
    val out = AsOfJoin
      .native(t, "sym", "tt", quotes.withColumnRenamed("sym", "qsym"), "qsym", "qt",
        direction = "nearest")
      .select($"id", $"px")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 150s to both 10:00 (1.0) and 10:05 (2.0): backward wins.
    assert(out === Map(1L -> 1.0))
  }

  test("asof native: invalid direction and float keys are rejected up front") {
    val q = quotes.withColumnRenamed("sym", "qsym")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.native(trades, "sym", "tt", q, "qsym", "qt", direction = "sideways")
    }
    assert(e1.getMessage.contains("backward|forward|nearest"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.native(
        trades.withColumn("sym", lit(1.0)), "sym", "tt",
        q.withColumn("qsym", lit(1.0)), "qsym", "qt")
    }
    assert(e2.getMessage.contains("float keys are not supported"))
  }

  test("asof native: compound (symbol, venue) key joins on all key columns") {
    val q2 = Seq(
      ("A", "X", ts("2024-01-01 10:00:00"), 1.0),
      ("A", "Y", ts("2024-01-01 10:00:00"), 5.0)
    ).toDF("qsym", "qvenue", "qt", "px")
    val t2 = Seq(
      ("A", "X", ts("2024-01-01 10:01:00"), 1L),
      ("A", "Y", ts("2024-01-01 10:01:00"), 2L),
      ("A", "Z", ts("2024-01-01 10:01:00"), 3L) // venue never quoted -> null
    ).toDF("sym", "venue", "tt", "id")
    val out = AsOfJoin.nativeMultiKey(t2, Seq("sym", "venue"), "tt", q2, Seq("qsym", "qvenue"), "qt")
      .select($"id", $"px")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out === Map(1L -> 1.0, 2L -> 5.0, 3L -> null))
  }

  test("asof native: self-join lineage is re-aliased, not ambiguous") {
    val ev = Seq(("A", ts("2024-01-01 10:00:00"), 1L),
                 ("A", ts("2024-01-01 10:02:00"), 2L)).toDF("k", "t", "v")
    // prior self row strictly... inclusive: row 1 matches itself (t <= t)
    val out = AsOfJoin.native(ev, "k", "t", ev, "k", "t")
    assert(out.columns.length === 6)
    assert(out.count() === 2)
  }

  test("asof native: clear errors for unknown columns and mismatched types") {
    val q = quotes.withColumnRenamed("sym", "qsym")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.native(trades, "nope", "tt", q, "qsym", "qt")
    }
    assert(e1.getMessage.contains("left key column 'nope'"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.native(trades, "sym", "tt", q.withColumn("qsym", lit(1)), "qsym", "qt")
    }
    assert(e2.getMessage.contains("key types differ"))
  }

  test("stream-static as-of enrichment equals one-shot batch join across micro-batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val q = quotes.withColumnRenamed("sym", "qsym")
    val tradeRows = trades.filter($"sym".isNotNull)
      .as[(String, java.sql.Timestamp, Long)].collect()
    val in = MemoryStream[(String, java.sql.Timestamp, Long)]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Option[Double])]()
    val sq = graft.streaming.RainStorm.enrichAsOf(
      in.toDF.toDF("sym", "tt", "id"), q, "sym", "tt", "qsym", "qt",
      batch => batch.select($"id", $"px").collect().foreach(r =>
        got.add(r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      in.addData(tradeRows.take(3).toIndexedSeq: _*); sq.processAllAvailable()
      in.addData(tradeRows.drop(3).toIndexedSeq: _*); sq.processAllAvailable()
    } finally sq.stop()
    val streamed = got.toArray(Array.empty[(Long, Option[Double])]).toMap
    val batch = AsOfJoin.native(trades.filter($"sym".isNotNull), "sym", "tt", q, "qsym", "qt")
      .select($"id", $"px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(streamed === batch)
  }

  test("h7b native result == h7 union+window result on sf0.001") {
    val a = Headline.h7.run(spark, TestSpark.sf0001).collect().toSeq
    val b = Headline.h7b.run(spark, TestSpark.sf0001).collect().toSeq
    assert(a.size === b.size)
    assert(a === b)
  }

  private def countOf(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("h7b plan: AsOfJoin exec node with one exchange+sort per side") {
    val p = Headline.h7b.run(spark, TestSpark.sf0001).queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    val belowJoin = p.substring(p.indexOf("AsOfJoin"))
    assert(countOf(belowJoin, "Exchange hashpartitioning") == 2,
      s"expected exactly 2 hash exchanges under the join:\n$p")
  }

  test("optimizer rule: left-only filter above the join is pushed to the parquet scan") {
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp_ntz").as("ts"))
    val od = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp_ntz").as("o_time"), col("o_totalprice"))
    val p = AsOfJoin.native(ev, "user_id", "ts", od, "o_custkey", "o_time")
      .filter($"event_id" < 100L)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(event_id), LessThan(event_id,100)"),
      s"left-side predicate must reach the events scan:\n$p")
  }

  test("optimizer rule: unused right columns are pruned from the orders scan") {
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp_ntz").as("ts"))
    val od = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp_ntz").as("o_time"),
              col("o_totalprice"), col("o_orderpriority"))
    val p = AsOfJoin.native(ev, "user_id", "ts", od, "o_custkey", "o_time")
      .select($"event_id", $"o_time")
      .queryExecution.executedPlan.toString
    assert(!p.contains("o_orderpriority"), s"untouched right column must be pruned from the scan:\n$p")
    assert(!p.contains("o_totalprice"), s"untouched right column must be pruned from the scan:\n$p")
  }

  test("pre-partitioned + pre-sorted inputs plan with NO added exchange or sort") {
    val t = trades.filter($"sym".isNotNull)
      .repartition(4, $"sym").sortWithinPartitions($"sym", $"tt")
    val q = quotes.withColumnRenamed("sym", "qsym")
      .repartition(4, $"qsym").sortWithinPartitions($"qsym", $"qt")
    val exec = AsOfJoin.native(t, "sym", "tt", q, "qsym", "qt")
      .queryExecution.executedPlan.toString
    val below = exec.substring(exec.indexOf("AsOfJoin"))
    // the only allowed exchanges/sorts are the two explicit repartition()/
    // sortWithinPartitions() pairs we wrote; EnsureRequirements must not add
    // more — that exchange-elision is the point of declaring requirements
    assert(countOf(below, "Exchange") == 2, exec)
    assert(countOf(below, "Sort ") == 2, exec)
  }
}
