package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.RankStats

/** Rank-statistics family: planted fixtures with driver-side exact replays —
  * a separated A/B pair where Mann–Whitney must fire, a tie-heavy frame
  * pinning the doubled-rank/tie-correction arithmetic, a full-separation
  * drift pair for KS, and perfectly monotone/anti-monotone books pinning
  * Spearman at exactly ±10⁶ ppm.
  */
class RankStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(day: Int): Timestamp = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  private def writeEvents(dir: String, rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("mannwhitney_u: separated arms fire the gate; U and ties replayed exactly") {
    // 40 users: even user_ids (arm A) spend ~100, odd (arm B) spend ~500 —
    // complete separation, so U_A = 0 (every A-spend below every B-spend).
    val rows = (0 until 40).map { u =>
      val v = if (u % 2 == 0) 100.0 + u else 500.0 + u
      (u.toLong, ts(1 + u % 28), u.toLong, "view", v, "")
    }
    val dir = "/tmp/graft_rankstats_mw_sep"
    writeEvents(dir, rows)
    val r = RankStats.mannWhitneyU.run(spark, dir).collect().head
    assert(r.getAs[Long]("n_a") == 20L && r.getAs[Long]("n_b") == 20L)
    // all spends distinct → no tie correction
    assert(r.getAs[Long]("tie_cubes") == 0L)
    // complete separation: R_A = 1+2+…+20 = 210 → 2R_A = 420; 2U_A = 420 − 20·21 = 0
    assert(r.getAs[Long]("u_a_x2") == 0L)
    // z = (0 − 400)/sqrt(400·41/3) = −5.4100…
    assert(r.getAs[Long]("significant") == 1L)
    assert(math.abs(r.getAs[Long]("z_milli") + 5410L) <= 1L)
  }

  test("mannwhitney_u: heavy ties hit the average-rank and tie-cube arithmetic") {
    // arm A: 6 users all spending 100.00; arm B: 6 users all spending 100.00
    // → one tie group of 12: U_A = n_a·n_b/2 exactly, z = 0 (zero variance).
    val rows = (0 until 12).map { u =>
      (u.toLong, ts(1 + u), u.toLong, "view", 100.0, "")
    }
    val dir = "/tmp/graft_rankstats_mw_tie"
    writeEvents(dir, rows)
    val r = RankStats.mannWhitneyU.run(spark, dir).collect().head
    assert(r.getAs[Long]("tie_cubes") == 12L * 12L * 12L - 12L)
    // 2R_A = Σ n1(2·0 + 12 + 1) = 6·13 = 78; 2U_A = 78 − 6·7 = 36 = n_a·n_b
    assert(r.getAs[Long]("u_a_x2") == 36L)
    assert(r.getAs[Long]("z_milli") == 0L && r.getAs[Long]("significant") == 0L)
  }

  test("ks_drift: planted full separation across the midpoint reaches D = 1") {
    // days 1–10: value 100.00; days 21–30: value 200.00 → mid = (0+29)/2
    // splits them; CDFs fully separated at cents 10000 → d_ppm = 1e6.
    val rows = (0 until 30).map { i =>
      val day = 1 + i
      val v = if (day <= 10) 100.0 else if (day >= 21) 200.0 else (if (i % 2 == 0) 100.0 else 200.0)
      (i.toLong, ts(day), i.toLong, "view", v, "")
    }
    val dir = "/tmp/graft_rankstats_ks"
    writeEvents(dir, rows)
    val r = RankStats.ksDrift.run(spark, dir).collect().head
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == 30L)
    // max deviation is attained at the lower value level
    assert(r.getAs[Long]("at_cents") == 10000L)
    assert(r.getAs[Long]("d_ppm") > 500000L)
    assert(r.getAs[Long]("significant") == 1L)
  }

  test("ks_drift: identical halves stay quiet") {
    // same value every day → D = 0 on the shared support
    val rows = (0 until 30).map { i => (i.toLong, ts(1 + i % 28), i.toLong, "view", 150.0, "") }
    val dir = "/tmp/graft_rankstats_ks0"
    writeEvents(dir, rows)
    val r = RankStats.ksDrift.run(spark, dir).collect().head
    assert(r.getAs[Long]("d_ppm") == 0L)
    assert(r.getAs[Long]("significant") == 0L)
  }

  test("permutation_test: planted separation is extreme vs every hash design; null data is not") {
    // 40 users, even arm ~100.00, odd arm ~5000.00 — the observed split is
    // the most extreme labelling; no hash design should reproduce it.
    val sep = (0 until 40).map { u =>
      val v = if (u % 2 == 0) 100.0 + u else 5000.0 + u
      (u.toLong, ts(1 + u % 28), u.toLong, "view", v, "")
    }
    val dirSep = "/tmp/graft_rankstats_perm_sep"
    writeEvents(dirSep, sep)
    val r = RankStats.permutationTest.run(spark, dirSep).collect().head
    assert(r.getAs[Long]("n_users") == 40L && r.getAs[Long]("k") == 64L)
    // driver-side replay of the 64 designs over the same closed form
    val spend = (0 until 40).map(u => u.toLong -> math.round((if (u % 2 == 0) 100.0 + u else 5000.0 + u) * 100)).toMap
    def stat(armOf: Long => Long): (BigInt, BigInt, BigInt) = {
      var s0, s1 = BigInt(0); var n0, n1 = 0L
      spend.foreach { case (u, c) =>
        if (armOf(u) == 1) { s1 += c; n1 += 1 } else { s0 += c; n0 += 1 }
      }
      ((s1 * n0 - s0 * n1).abs, BigInt(n0), BigInt(n1))
    }
    val (tObs, n0o, n1o) = stat(u => u % 2)
    val extreme = (0 until 64).count { s =>
      val (t, n0, n1) = stat { u =>
        val w = ((2654435761L * (2 * s + 3)) % 2147483647L * (u % 2147483647L)
          + 104729L * s) % 2147483647L
        w * w % 2147483647L % 2
      }
      t * n0o * n1o >= tObs * n0 * n1
    }
    assert(r.getAs[Long]("n_extreme") == extreme.toLong)
    assert(r.getAs[Long]("p_ppm") == (extreme + 1L) * 1000000L / 65L)
    assert(extreme == 0, s"no fixed design should match a planted 50x separation, got $extreme")
    assert(r.getAs[Long]("significant") == 1L)

    // identical spends: every |mean diff| numerator collapses to the same
    // scaled form — the observed split is NOT special, p stays large.
    val nul = (0 until 40).map { u => (u.toLong, ts(1 + u % 28), u.toLong, "view", 100.0, "") }
    val dirNull = "/tmp/graft_rankstats_perm_null"
    writeEvents(dirNull, nul)
    val rn = RankStats.permutationTest.run(spark, dirNull).collect().head
    assert(rn.getAs[Long]("significant") == 0L)
    assert(rn.getAs[Long]("p_ppm") == 1000000L)
  }

  private def writeOrders(dir: String, rows: Seq[(Long, Long, String, Double, java.sql.Date, String)]): Unit = {
    import spark.implicits._
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
  }

  test("spearman: monotone book pins rho = +1e6, anti-monotone pins −1e6 exactly") {
    import java.sql.Date
    val day = Date.valueOf("2024-01-05")
    val n = 12
    // customer k: k+1 orders; spend strictly INCREASING in k → rx == ry.
    var key = 0L
    val up = (0 until n).flatMap { k =>
      val big = (0L, k.toLong, "O", (k + 1) * 1000.0, day, "1-URGENT")
      val small = (0 until k).map(_ => (0L, k.toLong, "O", 0.01, day, "1-URGENT"))
      (big +: small).map { r => key += 1; r.copy(_1 = key) }
    }
    val upDir = "/tmp/graft_rankstats_sp_up"
    writeOrders(upDir, up)
    val u = RankStats.spearmanCorr.run(spark, upDir).collect().head
    assert(u.getAs[Long]("n") == n.toLong)
    assert(u.getAs[Double]("sum_d2") == 0.0)
    assert(u.getAs[Long]("rho_ppm") == 1000000L)

    // customer k: k+1 orders; spend strictly DECREASING in k → reversed
    // permutation: Σd² = n(n²−1)/3 and ρ = −1 exactly.
    key = 0L
    val down = (0 until n).flatMap { k =>
      val big = (0L, k.toLong, "O", (n - k) * 1000.0, day, "1-URGENT")
      val small = (0 until k).map(_ => (0L, k.toLong, "O", 0.01, day, "1-URGENT"))
      (big +: small).map { r => key += 1; r.copy(_1 = key) }
    }
    val downDir = "/tmp/graft_rankstats_sp_down"
    writeOrders(downDir, down)
    val dn = RankStats.spearmanCorr.run(spark, downDir).collect().head
    assert(dn.getAs[Double]("sum_d2") == (n.toLong * (n.toLong * n - 1) / 3).toDouble)
    assert(dn.getAs[Long]("rho_ppm") == -1000000L)
  }

  test("kruskal_wallis: textbook two-group frame pins H = 2.4 exactly") {
    // click = {1.00, 2.00}, view = {3.00, 4.00}: ranks 1,2 vs 3,4 — n = 4,
    // R_click = 3, d_click = 2·3 − 2·5 = −4, d_view = +4, no ties:
    // H = 3·(16/2 + 16/2)/(4·5) = 2.4. Below χ²(1) = 3.841 → not significant.
    val rows = Seq(
      (0L, ts(1), 0L, "click", 1.0, ""), (1L, ts(2), 1L, "click", 2.0, ""),
      (2L, ts(3), 2L, "view", 3.0, ""), (3L, ts(4), 3L, "view", 4.0, ""))
    val dir = "/tmp/graft_rankstats_kw2"
    writeEvents(dir, rows)
    val r = RankStats.kruskalWallis.run(spark, dir).collect().head
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("h_milli") == 2400L)
    assert(r.getAs[Long]("significant") == 0L)
  }

  test("kruskal_wallis: three fully separated groups fire the chi2 gate") {
    // click ranks 1–5, view 6–10, purchase 11–15 (distinct values):
    // d = (−50, 0, 50), H = 3·(2500/5 + 0 + 2500/5)/(15·16) = 12.5 —
    // far above χ²(2) = 5.991.
    val rows = (0 until 5).flatMap { i =>
      Seq(
        (i.toLong, ts(1 + i), i.toLong, "click", 1.0 + i, ""),
        ((i + 5).toLong, ts(1 + i), (i + 5).toLong, "view", 101.0 + i, ""),
        ((i + 10).toLong, ts(1 + i), (i + 10).toLong, "purchase", 201.0 + i, ""))
    }
    val dir = "/tmp/graft_rankstats_kw3"
    writeEvents(dir, rows)
    val r = RankStats.kruskalWallis.run(spark, dir).collect().head
    assert(r.getAs[Long]("n") == 15L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("h_milli") == 12500L)
    assert(r.getAs[Long]("significant") == 1L)
  }

  test("kruskal_wallis: one all-tied value pins the corr <= 0 guard at H = 0") {
    val rows = (0 until 12).map { i =>
      (i.toLong, ts(1 + i), i.toLong, Seq("click", "view", "error")(i % 3), 100.0, "")
    }
    val dir = "/tmp/graft_rankstats_kw_tie"
    writeEvents(dir, rows)
    val r = RankStats.kruskalWallis.run(spark, dir).collect().head
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("h_milli") == 0L && r.getAs[Long]("significant") == 0L)
  }
}
