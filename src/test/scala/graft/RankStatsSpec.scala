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

  test("wilcoxon_signed_rank: uniform paired lift fires; zero diffs drop; balanced mix is quiet") {
    // 20 users, pre (day 1) value 100+u, post (day 28) value 200+u → every
    // d = +10000 cents: one tie group of 20, W⁺ = n(n+1)/2 = 210,
    // z = 210/sqrt(20·21·41/6 − (20³−20)/12) = sqrt(20) ≈ 4.4721.
    val up = (0 until 20).flatMap { u =>
      Seq((2L * u, ts(1), u.toLong, "view", 100.0 + u, ""),
        (2L * u + 1, ts(28), u.toLong, "view", 200.0 + u, ""))
    }
    // plus 5 users with IDENTICAL pre/post — zero diffs must drop.
    val flat = (100 until 105).flatMap { u =>
      Seq((1000L + 2 * u, ts(1), u.toLong, "view", 300.0, ""),
        (1001L + 2 * u, ts(28), u.toLong, "view", 300.0, ""))
    }
    val dir = "/tmp/graft_rankstats_wsr_up"
    writeEvents(dir, up ++ flat)
    val r = RankStats.wilcoxonSignedRank.run(spark, dir).collect().head
    assert(r.getAs[Long]("n_pairs") == 20L)
    assert(r.getAs[Long]("w_plus_x2") == 420L)
    assert(r.getAs[Long]("tie_cubes") == 20L * 20L * 20L - 20L)
    assert(r.getAs[Long]("z_milli") == 4472L)
    assert(r.getAs[Long]("significant") == 1L)

    // 10 up / 10 down by the same |d| → W⁺ is exactly half the rank mass.
    val mixed = (0 until 20).flatMap { u =>
      val post = if (u % 2 == 0) 200.0 else 0.0
      Seq((2L * u, ts(1), u.toLong, "view", 100.0, ""),
        (2L * u + 1, ts(28), u.toLong, "view", post, ""))
    }
    val dirM = "/tmp/graft_rankstats_wsr_mix"
    writeEvents(dirM, mixed)
    val m = RankStats.wilcoxonSignedRank.run(spark, dirM).collect().head
    assert(m.getAs[Long]("n_pairs") == 20L)
    assert(m.getAs[Long]("w_plus_x2") == 210L)
    assert(m.getAs[Long]("z_milli") == 0L && m.getAs[Long]("significant") == 0L)
  }

  test("bootstrap_ci: driver replay of the 64 Poisson replicates; planted lift excludes 0; null interval is [0,0]") {
    // 40 users: even arm spends ~100, odd arm ~5000 — every replicate's
    // weighted means stay fully separated, so the CI must exclude 0.
    val sep = (0 until 40).map { u =>
      val v = if (u % 2 == 0) 100.0 + u else 5000.0 + u
      (u.toLong, ts(1 + u % 28), u.toLong, "view", v, "")
    }
    val dir = "/tmp/graft_rankstats_boot_sep"
    writeEvents(dir, sep)
    val r = RankStats.bootstrapCi.run(spark, dir).collect().head
    assert(r.getAs[Long]("n_users") == 40L)

    // exact driver-side replay of the published integer contract
    val M = 2147483647L
    val thresholds = Seq(790015083L, 1580030167L, 1975037709L, 2106706890L,
      2139624185L, 2146207644L, 2147304887L, 2147461637L, 2147481230L)
    def weight(u: Long, s: Long): Long = {
      val w1 = ((2246822519L * (2 * s + 5)) % M * (u % M) + 15485863L * s) % M
      val hv = (w1 * w1) % M
      val k = thresholds.indexWhere(hv < _)
      if (k < 0) 9L else k.toLong
    }
    val spend = (0 until 40).map(u =>
      u.toLong -> math.round((if (u % 2 == 0) 100.0 + u else 5000.0 + u) * 100)).toMap
    val vs = (0L until 64L).flatMap { s =>
      var s0, s1 = BigInt(0); var n0, n1 = 0L
      spend.foreach { case (u, c) =>
        val w = weight(u, s)
        if (u % 2 == 1) { s1 += w * c; n1 += w } else { s0 += w * c; n0 += w }
      }
      if (n0 > 0 && n1 > 0) Some((s1 * 1000000 / n1 - s0 * 1000000 / n0).toLong)
      else None
    }.sorted
    val k = vs.size.toLong
    assert(r.getAs[Long]("k_designs") == k)
    assert(r.getAs[Long]("ci_lo_micro") == vs((k * 25 / 1000).toInt))
    assert(r.getAs[Long]("ci_hi_micro") == vs((k - k * 25 / 1000 - 1).toInt))
    assert(r.getAs[Long]("ci_lo_micro") > 0L && r.getAs[Long]("significant") == 1L)

    // Poisson(1) mixer sanity at n = 20000: per-replicate empirical mean and
    // variance of the weights within 5% / 10% of 1.
    for (s <- Seq(0L, 17L, 63L)) {
      val ws = (0L until 20000L).map(weight(_, s))
      val mean = ws.sum.toDouble / ws.size
      val varw = ws.map(w => (w - mean) * (w - mean)).sum / ws.size
      assert(math.abs(mean - 1.0) < 0.05, s"replicate $s mean $mean")
      assert(math.abs(varw - 1.0) < 0.1, s"replicate $s var $varw")
    }

    // identical spends: every weighted mean is exactly the common spend on
    // both arms → every v = 0 → CI pins to [0, 0], not significant.
    val nul = (0 until 40).map { u => (u.toLong, ts(1 + u % 28), u.toLong, "view", 100.0, "") }
    val dirN = "/tmp/graft_rankstats_boot_null"
    writeEvents(dirN, nul)
    val rn = RankStats.bootstrapCi.run(spark, dirN).collect().head
    assert(rn.getAs[Long]("ci_lo_micro") == 0L && rn.getAs[Long]("ci_hi_micro") == 0L)
    assert(rn.getAs[Long]("significant") == 0L)
  }

  test("cochran_armitage: planted dose-response pins z = 2*sqrt(2); flat rates and all-converters are quiet") {
    // activity buckets k = 1,2,3 with conversion 0%, 50%, 100% (4 users
    // each): n = 12, R = 6, A = 48, B = 96 → z = 48/sqrt(6*6*96/12) = 2.8284.
    var eid = 0L
    def ev(u: Long, types: Seq[String]): Seq[(Long, Timestamp, Long, String, Double, String)] =
      types.map { t => eid += 1; (eid, ts(1 + (eid % 28).toInt), u, t, 10.0, "") }
    val rows =
      (0 until 4).flatMap(u => ev(u.toLong, Seq("view"))) ++
      (4 until 6).flatMap(u => ev(u.toLong, Seq("view", "view"))) ++
      (6 until 8).flatMap(u => ev(u.toLong, Seq("view", "purchase"))) ++
      (8 until 12).flatMap(u => ev(u.toLong, Seq("view", "purchase", "view")))
    val dir = "/tmp/graft_rankstats_ca"
    writeEvents(dir, rows)
    val r = RankStats.cochranArmitage.run(spark, dir).collect().head
    assert(r.getAs[Long]("n_users") == 12L && r.getAs[Long]("r_total") == 6L)
    assert(r.getAs[Long]("a_num") == 48L && r.getAs[Long]("b_sum") == 96L)
    assert(r.getAs[Long]("z_milli") == 2828L)
    assert(r.getAs[Long]("significant") == 1L)

    // flat rates across buckets → A = 0 → z = 0
    eid = 0L
    val flat =
      (0 until 2).flatMap(u => ev(u.toLong, Seq("view"))) ++
      (2 until 4).flatMap(u => ev(u.toLong, Seq("purchase"))) ++
      (4 until 6).flatMap(u => ev(u.toLong, Seq("view", "view"))) ++
      (6 until 8).flatMap(u => ev(u.toLong, Seq("view", "purchase")))
    val dirF = "/tmp/graft_rankstats_ca_flat"
    writeEvents(dirF, flat)
    val f = RankStats.cochranArmitage.run(spark, dirF).collect().head
    assert(f.getAs[Long]("a_num") == 0L && f.getAs[Long]("z_milli") == 0L)

    // every user converts → R = n → the degenerate guard pins z = 0
    eid = 0L
    val all = (0 until 6).flatMap(u => ev(u.toLong, Seq("purchase")))
    val dirA = "/tmp/graft_rankstats_ca_all"
    writeEvents(dirA, all)
    val a = RankStats.cochranArmitage.run(spark, dirA).collect().head
    assert(a.getAs[Long]("r_total") == a.getAs[Long]("n_users"))
    assert(a.getAs[Long]("z_milli") == 0L && a.getAs[Long]("significant") == 0L)
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
