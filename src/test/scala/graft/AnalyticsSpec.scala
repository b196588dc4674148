package graft

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics

/** Collocation / robust-statistics family: PMI ranking replayed driver-side
  * on a planted corpus, and Hampel MAD outliers on a planted order book
  * where a classical mean/stddev rule would be dragged by the outlier.
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("collocations_pmi: planted collocation outranks frequent-but-independent pair") {
    import spark.implicits._
    val dir = "/tmp/graft_analytics_pmi"
    // "new york" always co-occurs (25x); "the cat"/"the dog" are frequent but
    // "the" is ubiquitous, so their independence baseline is high.
    val filler = (1 to 25).map(i => (i.toLong, ("the cat sat on the mat and the dog ran " * 2).trim, "en", "web", 0L))
    val planted = (26 to 50).map(i => (i.toLong, "we flew to new york from new york yesterday", "en", "web", 0L))
    (filler ++ planted).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = Analytics.collocationsPmi.run(spark, dir).collect()
    assert(out.nonEmpty)
    val byName = out.map(r => r.getAs[String]("bigram") -> r.getAs[Double]("pmi_ratio")).toMap
    assert(byName.contains("new york"))
    assert(byName("new york") > byName.getOrElse("the cat", 0.0))
    // replay the ratio driver-side for the planted pair
    val rows = (filler ++ planted).flatMap(_._2.split(" ").filter(_.nonEmpty))
    val nTok = rows.size.toDouble
    val bigrams = (filler ++ planted).flatMap { case (_, t, _, _, _) =>
      val w = t.split(" ").filter(_.nonEmpty); w.zip(w.drop(1))
    }
    val nBig = bigrams.size.toDouble
    val cxy = bigrams.count(_ == ("new", "york")).toDouble
    val cx = rows.count(_ == "new").toDouble
    val cy = rows.count(_ == "york").toDouble
    val expected = cxy * nTok * nTok / (nBig * cx * cy)
    assert(math.abs(byName("new york") - expected) < 1e-9)
    // descending, deterministic ordering
    val ratios = out.map(_.getAs[Double]("pmi_ratio")).toSeq
    assert(ratios == ratios.sortBy(-_))
  }

  test("mad_outliers: spike day flagged, median not dragged by the outlier") {
    import spark.implicits._
    val dir = "/tmp/graft_analytics_mad"
    // 29 quiet days at ~100.00, one 10x spike. A mean/stddev estimate would
    // move with the spike; the median/MAD pair must not.
    val days = (1 to 29).map(i =>
      (i.toLong, 1L, "O", 100.0 + (i % 3), Date.valueOf(f"2024-01-${i}%02d"), "1-URGENT")) :+
      (30L, 1L, "O", 1000.0, Date.valueOf("2024-01-30"), "1-URGENT")
    days.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val out = Analytics.madOutliers.run(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Date]("day") == Date.valueOf("2024-01-30"))
    assert(r.getAs[Boolean]("is_high"))
    // med2 = 2 * median of the quiet-day cents (10100/10200), untouched by the spike
    assert(r.getAs[Long]("med2") === 20200L)
  }

  test("acf: alternating series gives negative lag-1, positive lag-2, exact ppm replay") {
    import spark.implicits._
    val dir = "/tmp/graft_analytics_acf"
    // 30-day strictly alternating revenue: acf(1) ~ -1, acf(2) ~ +1
    val xs = (1 to 30).map(i => if (i % 2 == 0) 200.0 else 100.0)
    xs.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, 1L, "O", v, Date.valueOf(f"2024-01-${i + 1}%02d"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val out = Analytics.acf.run(spark, dir).collect()
      .map(r => r.getAs[Long]("lag_k") -> r.getAs[Long]("acf_ppm")).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out(1L) < -900000L && out(2L) > 900000L && out(3L) < -850000L)
    // exact replay of the integer recurrence for lag 1
    val cents = xs.map(v => math.round(v * 100))
    val n = cents.size.toLong
    val sv = cents.sum
    val e = cents.map(c => n * c - sv)
    val nk = e.zip(e.drop(1)).map { case (a, b) => BigInt(a) * BigInt(b) }.sum
    val den = e.map(v => BigInt(v) * BigInt(v)).sum
    assert(out(1L) === (nk * 1000000 / den).toLong)
  }

  test("greedy_setcover: disjoint-vocabulary docs picked in gain order, coverage accumulates") {
    import spark.implicits._
    val dir = "/tmp/graft_analytics_cover"
    // doc 1 has 10 unique bigrams, doc 2 has 6, doc 3 repeats doc 1's text
    // (gain 0 after doc 1 is picked), doc 4 has 3 unique bigrams.
    def words(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val docs = Seq(
      (1L, words("a", 11), "en", "web", 0L),
      (2L, words("b", 7), "en", "web", 0L),
      (3L, words("a", 11), "en", "web", 0L),
      (4L, words("c", 4), "en", "web", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = Analytics.greedySetcover.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("pick_rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("gain"), r.getAs[Long]("covered_total")))
    // greedy: doc 1 (10 bigrams), doc 2 (6), doc 4 (3), then doc 3 ties at
    // gain 0 with nothing uncovered -> round aggregates empty, loop stops.
    assert(out.toSeq == Seq((1L, 1L, 10L, 10L), (2L, 2L, 6L, 16L), (3L, 4L, 3L, 19L)))
  }

  test("pca_topcomponent: planted dominant axis recovered with canonical sign") {
    import spark.implicits._
    val dir = "/tmp/graft_analytics_pca"
    // 200 vectors along axis 3 (both signs), faint noise on axis 10: the
    // second-moment matrix's top eigenvector is e3 regardless of the signs.
    val vecs = (1 to 200).map { i =>
      val v = Array.fill(64)(0.0f)
      v(3) = if (i % 2 == 0) 0.5f else -0.5f
      v(10) = 0.01f
      (i.toLong, v.toSeq, "a")
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = Analytics.pcaTopComponent.run(spark, dir).collect()
    assert(out.length == 64)
    val comp = out.map(r => r.getAs[Long]("dim") -> r.getAs[Long]("component_scaled")).toMap
    assert(comp(3L) == 1000000L) // dominant axis, renormalized to +1e6
    assert((0 until 64).filter(i => i != 3 && i != 10).forall(i => math.abs(comp(i.toLong)) < 1000L))
    assert(out.head.getAs[Long]("eigen_scaled") > 0L)
  }

  test("truss: K4 survives the 4-truss, pendant triangle and bridge peel away") {
    import spark.implicits._
    // K4 on {1,2,3,4}: each edge closes 2 triangles. Triangle {5,6,7}
    // hangs off node 4 via bridge 4-5: its edges have support 1 -> peeled.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (5L, 7L), (6L, 7L)
    ).toDF("lo", "hi")
    val out = graft.functions.GraphOps.truss(edges, "lo", "hi", k = 4, rounds = 4)
      .orderBy("lo", "hi").collect()
      .map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"), r.getAs[Long]("sup")))
    assert(out.toSeq == Seq((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))

    // reversed orientations and self-loops canonicalize, never drop
    val messy = Seq(
      (2L, 1L), (1L, 3L), (4L, 1L), (2L, 3L), (4L, 2L), (3L, 4L), (1L, 2L), (3L, 3L)
    ).toDF("lo", "hi")
    val out2 = graft.functions.GraphOps.truss(messy, "lo", "hi", k = 4, rounds = 4)
      .orderBy("lo", "hi").collect()
      .map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"), r.getAs[Long]("sup")))
    assert(out2.toSeq == Seq((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))
  }

  test("truss: 4 rounds reach the fixpoint on the sf0.001 registry graph") {
    val base = Analytics.ktruss.run(spark, "/root/testdata/sf0.001").collect().toSet
    val e0raw = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select((org.apache.spark.sql.functions.col("user_id") % 211).as("a"),
        (org.apache.spark.sql.functions.col("event_id") % 211).as("b"))
    import org.apache.spark.sql.functions._
    val canon = e0raw.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
      .distinct().localCheckpoint(true)
    val divisor = math.max(1L, canon.count() / 1500L)
    val e0 = canon.filter((col("lo") * 31 + col("hi") * 17) % divisor === 0)
    val deeper = graft.functions.GraphOps.truss(e0, "lo", "hi", k = 4, rounds = 6)
      .orderBy("lo", "hi").collect().toSet
    assert(deeper == base)
  }

  test("chi2_independence: exact zero on an independent table, positive under dependence") {
    import spark.implicits._
    val dir = "/tmp/graft_analytics_chi2"
    // independence by construction: every (pri, rf) combination appears
    // pri_weight * rf_weight times -> O*N == rt*ct exactly -> chi2 = 0
    val priW = Map("1-URGENT" -> 1, "2-HIGH" -> 2)
    val rfW = Map("A" -> 1, "N" -> 3)
    var key = 0L
    val orders = for { (p, pw) <- priW.toSeq; i <- 1 to pw * 4 } yield {
      key += 1; (key, 1L, "O", 100.0, Date.valueOf("2024-01-01"), p)
    }
    val orderKeysByPri = orders.groupBy(_._6).view.mapValues(_.map(_._1)).toMap
    val lines = for {
      (p, pw) <- priW.toSeq
      (rf, rw) <- rfW.toSeq
      // pw*rw lineitems for this cell, spread over the priority's orders
      (ok, i) <- orderKeysByPri(p).take(pw * rw).zipWithIndex
    } yield (ok, 1L, 1L, (i + 1).toLong, 1.0, 1.0, 0.0, 0.0, rf, "O", Date.valueOf("2024-01-02"))
    orders.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    lines.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val out = Analytics.chi2Independence.run(spark, dir).collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Long]("chi2_total_ppm") == 0L))
    assert(out.forall(_.getAs[Long]("cell_chi2_ppm") == 0L))

    // real data is NOT independent-by-construction: statistic must be > 0
    val real = Analytics.chi2Independence.run(spark, "/root/testdata/sf0.001").collect()
    assert(real.head.getAs[Long]("chi2_total_ppm") > 0L)
  }

  test("benford_digits: leading digit from the decimal string, exact ppm shares") {
    import spark.implicits._
    val dir = "/tmp/graft_analytics_benford"
    // 90 orders: digit of round(v*100) — includes the 999.99 -> 99999 -> '9'
    // and 100.00 -> 10000 -> '1' string-boundary cases a log10 would risk.
    val vals = Seq.fill(50)(100.0) ++ Seq.fill(30)(999.99) ++ Seq.fill(10)(55.5)
    vals.zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, 1L, "O", v, Date.valueOf("2024-01-01"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val out = Analytics.benfordDigits.run(spark, dir).collect()
      .map(r => r.getAs[Long]("digit") -> (r.getAs[Long]("observed"), r.getAs[Long]("observed_ppm"))).toMap
    assert(out(1L) == ((50L, 555555L))) // 50/90 truncating ppm
    assert(out(9L) == ((30L, 333333L)))
    assert(out(5L) == ((10L, 111111L)))
    assert(!out.contains(2L))
  }

  test("kaplan_meier: hand-derived curve, same-day-censor tie and purchase-before-view") {
    import spark.implicits._
    val dir = "/tmp/graft_analytics_km"
    def d(day: Int) = new java.sql.Timestamp(1700000000000L + day * 86400000L)
    // u1,u3: event t=2; u2: censored t=1; u4: censored t=5; u5: event t=3;
    // u6: censored t=3 (same-day tie -> stays in the risk set for day 3);
    // u7: purchase BEFORE first view -> censored at t=0, never an event.
    val rows = Seq(
      (1L, d(0), 1L, "view"), (2L, d(2), 1L, "purchase"),
      (3L, d(0), 2L, "view"), (4L, d(1), 2L, "click"),
      (5L, d(0), 3L, "view"), (6L, d(2), 3L, "purchase"),
      (7L, d(0), 4L, "view"), (8L, d(5), 4L, "click"),
      (9L, d(0), 5L, "view"), (10L, d(3), 5L, "purchase"),
      (11L, d(0), 6L, "view"), (12L, d(3), 6L, "click"),
      (13L, d(0), 7L, "purchase"), (14L, d(1), 7L, "view")
    ).map { case (id, ts, u, et) => (id, ts, u, et, 0.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = Analytics.kaplanMeier.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("t_days"), r.getAs[Long]("n_risk"), r.getAs[Long]("d"),
        r.getAs[Long]("c"), r.getAs[Long]("survival_scaled")))
    // N=7; prior removals before t=2: censors at t=0 (u7) and t=1 (u2).
    // S(2) = 3/5; S(3) = S(2)*2/3 = 2/5 with u6 still at risk on day 3.
    assert(out.toSeq == Seq(
      (2L, 5L, 2L, 0L, 600000000000L),
      (3L, 3L, 1L, 1L, 400000000000L)))
  }

  test("theil_sen: exact trend slope, unmoved by one fat-finger day") {
    import spark.implicits._
    val dir = "/tmp/graft_analytics_ts"
    // perfect +100.00/day trend, day 15 fat-fingered to 1e6: only 29 of the
    // 435 pairwise slopes involve the outlier, so the median is untouched.
    val days = (0 until 30).map { i =>
      val v = if (i == 15) 1000000.0 else 100.0 * (i + 1)
      ((i + 1).toLong, 1L, "O", v, Date.valueOf(f"2024-01-${i + 1}%02d"), "1-URGENT")
    }
    days.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val out = Analytics.theilSen.run(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_pairs") == 435L)
    // slope = 10000 cents/day -> ppm 1e10, doubled-domain 2e10
    assert(out.head.getAs[Long]("slope_med2_ppm") == 20000000000L)
  }

  test("graph_assortativity: star graph is maximally disassortative (-1)") {
    // a 5-leaf star: every edge joins deg-5 to deg-1 -> r = -1 exactly
    import spark.implicits._
    val dir = "/tmp/graft_analytics_assort"
    // craft events whose folded (user_id%211, event_id%211) graph is the star
    // 0-{1..5}: user 0 with event ids 1..5 (all < 211, distinct, no self-loop)
    val rows = (1 to 5).map(i => (i.toLong, new java.sql.Timestamp(1700000000000L + i), 0L, "view", 0.0, ""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Analytics.graphAssortativity.run(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("m") == 10L) // 5 edges, both orientations
    assert(out.head.getAs[Long]("assortativity_ppm") == -1000000L)
  }

  test("seasonal_decompose: components recompose and the planted weekly pattern lands in seasonal") {
    import spark.implicits._
    val dir = "/tmp/graft_analytics_season"
    // 28 days, flat level 100 with +70 every Sunday: trend stays ~flat,
    // seasonal absorbs the weekly spike, residual is small.
    def ts(day: Int, k: Int) = new java.sql.Timestamp(86400000L * (19700 + day) + k)
    val rows = for {
      day <- 0 until 28
      dow = java.time.LocalDate.ofEpochDay(19700 + day).getDayOfWeek.getValue % 7 // Sunday=0
      n = if (dow == 0) 170 else 100
      k <- 0 until n
    } yield ((day * 1000 + k).toLong, ts(day, k), k.toLong, "view", 0.0, "")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = Analytics.seasonalDecompose.run(spark, dir).collect()
    assert(out.length == 28)
    out.foreach { r =>
      // decomposition identity: 1000*n == trend + seasonal + residual
      assert(1000L * r.getAs[Long]("n") ==
        r.getAs[Long]("trend_milli") + r.getAs[Long]("seasonal_milli") + r.getAs[Long]("residual_milli"))
    }
    // interior Sunday seasonal must dominate the weekday seasonal
    val sundays = out.filter(r => r.getAs[Long]("n") == 170).map(_.getAs[Long]("seasonal_milli"))
    val weekdays = out.filter(r => r.getAs[Long]("n") == 100).map(_.getAs[Long]("seasonal_milli"))
    assert(sundays.min > weekdays.max + 30000L)
  }

  test("runs_test: alternating series maximizes runs, trending series minimizes them") {
    import spark.implicits._
    def write(dir: String, xs: Seq[Double]): Unit =
      xs.zipWithIndex.map { case (v, i) =>
        ((i + 1).toLong, 1L, "O", v, Date.valueOf(f"2024-01-${i + 1}%02d"), "1-URGENT")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val alt = "/tmp/graft_analytics_runs_alt"
    write(alt, (1 to 20).map(i => if (i % 2 == 0) 200.0 else 100.0))
    val a = Analytics.runsTest.run(spark, alt).collect().head
    assert(a.getAs[Long]("n_runs") == 20L) // every day flips sign
    assert(a.getAs[Long]("expected_runs_milli") == 11000L) // 1 + 2*10*10/20 = 11

    val trend = "/tmp/graft_analytics_runs_tr"
    write(trend, (1 to 20).map(i => 100.0 * i))
    val t = Analytics.runsTest.run(spark, trend).collect().head
    assert(t.getAs[Long]("n_runs") == 2L) // one below-median run, one above
  }

  test("forecast_backtest: exact MAPE on a planted series where seasonal-naive wins") {
    import spark.implicits._
    val dir = "/tmp/graft_analytics_bt"
    // strict weekly pattern over 28 days: y_{t-7} is a perfect forecast
    // (MAPE 0), y_{t-1} is wrong on every day the pattern moves.
    val pattern = Seq(100.0, 100.0, 100.0, 100.0, 100.0, 300.0, 400.0)
    val days = (0 until 28).map { i =>
      ((i + 1).toLong, 1L, "O", pattern(i % 7), Date.valueOf(f"2024-01-${i + 1}%02d"), "1-URGENT")
    }
    days.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val out = Analytics.forecastBacktest.run(spark, dir).collect().head
    assert(out.getAs[Long]("n_folds") == 21L)
    assert(out.getAs[Long]("mape_seasonal_ppm") == 0L)
    // naive-1 errors: |100-400|/100 thrice weekly etc. — replay exactly
    val cents = (0 until 28).map(i => math.round(pattern(i % 7) * 100))
    val apes = (7 until 28).map(t => math.abs(cents(t) - cents(t - 1)) * 1000000L / cents(t))
    assert(out.getAs[Long]("mape_naive_ppm") == apes.sum / apes.size)
  }

  test("skipgram_cooc: ±2 window pairs enumerated exactly, bounds respected") {
    import spark.implicits._
    val dir = "/tmp/graft_analytics_sg"
    // "a b c d" x5: 10 directed pairs per doc, each with count 5; the edge
    // tokens must NOT reach beyond the array (a has no -1/-2 contexts).
    Seq.fill(5)("a b c d").zipWithIndex.map { case (t, i) => ((i + 1).toLong, t, "en", "web", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = Analytics.skipgramCooc.run(spark, dir).collect()
      .map(r => (r.getAs[String]("w"), r.getAs[String]("c")) -> r.getAs[Long]("cnt")).toMap
    assert(out.size == 10)
    assert(out.values.forall(_ == 5L))
    assert(out.contains(("a", "c")) && out.contains(("d", "b")))
    assert(!out.contains(("a", "d"))) // distance 3 — outside the window
  }

  test("ab_cuped: perfectly predictive covariate gives theta=1 and equalizes the arms") {
    import spark.implicits._
    val dir = "/tmp/graft_analytics_cuped"
    def ts(day: Int, k: Int) = new java.sql.Timestamp(86400000L * (19700 + day) + k * 1000L)
    // user i makes i purchases pre-mid and i purchases post-mid: y == x,
    // so theta = 1 and every user's adjusted y is exactly x-bar — both
    // arms land on the same adjusted mean even though raw means differ.
    val rows = for {
      u <- 1 to 40
      (day, k) <- (1 to u).map(k => (u % 10, k)) ++ (1 to u).map(k => (10 + u % 10, k))
    } yield ((u * 1000 + day * 100 + k).toLong, ts(day, k), u.toLong, "purchase", 0.0, "")
    // pin the day range so mid = (0+19+1)/2 = 10
    val anchor = Seq((1L, ts(0, 0), 1L, "view", 0.0, ""), (2L, ts(19, 0), 1L, "view", 0.0, ""))
    (rows ++ anchor).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = Analytics.abCuped.run(spark, dir).collect()
      .map(r => r.getAs[Long]("arm") -> (r.getAs[Long]("n_users"), r.getAs[Long]("mean_y_ppm"),
        r.getAs[Long]("mean_y_adj_ppm"), r.getAs[Long]("theta_ppm"))).toMap
    assert(out(0L)._4 == 1000000L && out(1L)._4 == 1000000L)
    assert(out(0L)._2 != out(1L)._2, "raw means must differ (odd vs even user ids)")
    assert(out(0L)._3 == out(1L)._3, "adjusted means must coincide when y == x")
    // x-bar = 20.5 -> 20500000 ppm
    assert(out(0L)._3 == 20500000L)
  }

  test("srm_check: balanced split passes, 3:1 split trips the chi-square gate") {
    import spark.implicits._
    def write(dir: String, users: Seq[Long]): Unit =
      users.zipWithIndex.map { case (u, i) =>
        ((i + 1).toLong, new java.sql.Timestamp(1700000000000L + i), u, "view", 0.0, "")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val bal = "/tmp/graft_analytics_srm_b"
    write(bal, (1L to 40L))
    val b = Analytics.srmCheck.run(spark, bal).collect().head
    assert(b.getAs[Long]("srm_chi2_ppm") == 0L && b.getAs[Boolean]("is_balanced"))

    val skew = "/tmp/graft_analytics_srm_s"
    write(skew, (1L to 60L by 2).take(10) ++ (2L to 120L by 2).take(30)) // 10 odd, 30 even
    val sk = Analytics.srmCheck.run(spark, skew).collect().head
    assert(sk.getAs[Long]("srm_chi2_ppm") == 10000000L) // (20^2 * 1e6) / 40
    assert(!sk.getAs[Boolean]("is_balanced"))
  }
}
