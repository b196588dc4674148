package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalysis
import graft.functions.Layout.LineageOps

/** Statistical mining over the corpus and the order book — the
  * collocation / robust-statistics family (pointwise mutual information
  * phrase mining; Hampel's median-absolute-deviation outlier rule). Both
  * follow the house discipline: collapse the corpus to partials on a
  * high-cardinality key first, keep every comparison in exact integer (or
  * same-shape IEEE) arithmetic, and let the model-sized tail stages run on
  * calendar- or vocabulary-bounded frames.
  */
object Analytics {

  /** Collocation mining by pointwise mutual information: the top word
    * bigrams whose observed frequency most exceeds the independence
    * baseline — the phrase-mining pass (Church & Hanks 1990) that feeds
    * tokenizer vocabularies and stop-phrase lists. PMI's log is monotone,
    * so ranking happens on the raw likelihood ratio
    * `P(xy) / (P(x)·P(y)) = (c_xy · N²) / (B · c_x · c_y)` — computed with
    * the IDENTICAL double expression shape on both engines (IEEE ops are
    * exactly specified; same shape ⇒ same bits, the x_distinct_kmv
    * precedent). A count floor (c_xy ≥ 20) keeps the rare-pair PMI
    * pathology out, the standard practice.
    *
    * Scale shape: one explode → partial→final hash agg for bigram counts,
    * one for unigram counts; N and B are aggregated from those count
    * tables (1-row frames, never a second corpus scan). The scoring join
    * is vocabulary-sized on both sides — AQE broadcast when small, plain
    * equi-join when not — and the top-20 is a TakeOrdered, not a full
    * sort.
    */
  val collocationsPmi = Q(
    "x_collocations_pmi",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(TextAnalysis.tokens(col("text")).as("t"))
      val bc = toks
        .select(
          explode(
            when(size(col("t")) >= 2,
              transform(
                sequence(lit(0), size(col("t")) - 2),
                i => struct(
                  element_at(col("t"), i + 1).as("w1"),
                  element_at(col("t"), i + 2).as("w2"))))
              .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
          ).as("bg"))
        .select(col("bg.w1"), col("bg.w2"))
        .groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("cxy"))
      val un = toks
        .select(explode(col("t")).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("c"))
      val nTok = un.agg(sum(col("c")).as("n_tok"))
      val nBig = bc.agg(sum(col("cxy")).as("n_big"))
      bc.filter(col("cxy") >= 20)
        .join(un.select(col("tok").as("w1"), col("c").as("cx")), "w1")
        .join(un.select(col("tok").as("w2"), col("c").as("cy")), "w2")
        .crossJoin(nTok)
        .crossJoin(nBig)
        .select(
          concat_ws(" ", col("w1"), col("w2")).as("bigram"),
          col("cxy"), col("cx"), col("cy"),
          (col("cxy").cast("double") * col("n_tok") * col("n_tok") /
            (col("n_big").cast("double") * col("cx") * col("cy"))).as("pmi_ratio"))
        .orderBy(col("pmi_ratio").desc, col("bigram"))
        .limit(20)
    },
    Some("""WITH toks AS (
              SELECT list_filter(string_split(text, ' '), w -> w <> '') AS t FROM documents),
            bg AS (
              SELECT unnest(CASE WHEN len(t) >= 2
                THEN list_transform(range(1, len(t)), i -> [t[i], t[i+1]])
                ELSE CAST([] AS VARCHAR[][]) END) AS p
              FROM toks),
            bc AS (SELECT p[1] AS w1, p[2] AS w2, count(*) AS cxy FROM bg GROUP BY 1, 2),
            un AS (SELECT unnest(t) AS tok FROM toks),
            uc AS (SELECT tok, count(*) AS c FROM un GROUP BY 1),
            nt AS (SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM uc),
            nb AS (SELECT CAST(sum(cxy) AS BIGINT) AS n_big FROM bc)
            SELECT w1 || ' ' || w2 AS bigram, cxy, u1.c AS cx, u2.c AS cy,
              CAST(cxy AS DOUBLE) * n_tok * n_tok /
                (CAST(n_big AS DOUBLE) * u1.c * u2.c) AS pmi_ratio
            FROM bc
            JOIN uc u1 ON bc.w1 = u1.tok
            JOIN uc u2 ON bc.w2 = u2.tok
            CROSS JOIN nt CROSS JOIN nb
            WHERE cxy >= 20
            ORDER BY pmi_ratio DESC, bigram LIMIT 20""")
  )

  /** Robust outlier days by Hampel's rule: a day's revenue is anomalous
    * when its absolute deviation from the per-priority MEDIAN exceeds
    * 3 × 1.4826 × MAD (the median absolute deviation scaled to the normal
    * σ). Median/MAD have a 50% breakdown point — unlike the mean/stddev
    * z-score (and unlike x_anomaly_days' trailing-mean spike test), the
    * estimate itself cannot be dragged by the outliers it hunts.
    *
    * All arithmetic stays integer-exact: medians of BIGINT cents are
    * computed in a DOUBLED domain (`percentile_cont(0.5)` over 2·x is an
    * exact integer when the interpolation midpoint lands on .5), and the
    * threshold 3·1.4826 becomes the cross-multiplication
    * `10000·dev2 > 22239·mad4` — no float ever reaches a comparison.
    *
    * Scale shape: the order book collapses to (priority, day) partials
    * first (one high-cardinality exchange); the two grouped percentiles
    * then run over calendar-bounded series (~2.4k days per priority —
    * bounded by time, not data volume), the same bounded-final-stage
    * argument as x_max_concurrency.
    */
  val madOutliers = Q(
    "x_mad_outliers",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderdate").as("day"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      val med = daily
        .select(col("pri"), (col("cents") * 2).as("c2"))
        .groupBy(col("pri"))
        .agg(expr("CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY c2) AS BIGINT)").as("med2"))
      val dev = daily.join(med, "pri")
        .withColumn("dev2", abs(col("cents") * 2 - col("med2")))
      val mad = dev
        .select(col("pri"), (col("dev2") * 2).as("d2"))
        .groupBy(col("pri"))
        .agg(expr("CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY d2) AS BIGINT)").as("mad4"))
      dev.join(mad, "pri")
        .filter(col("dev2") * 10000 > col("mad4") * 22239)
        .select(col("pri"), col("day"), col("cents"), col("med2"), col("mad4"),
          (col("cents") * 2 > col("med2")).as("is_high"))
        .orderBy("pri", "day")
    },
    Some("""WITH daily AS (
              SELECT o_orderpriority AS pri, o_orderdate AS day,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
              FROM orders GROUP BY 1, 2),
            med AS (
              SELECT pri, CAST(quantile_cont(2 * cents, 0.5) AS BIGINT) AS med2
              FROM daily GROUP BY 1),
            dev AS (
              SELECT d.pri, d.day, d.cents, m.med2, abs(2 * d.cents - m.med2) AS dev2
              FROM daily d JOIN med m USING (pri)),
            mad AS (
              SELECT pri, CAST(quantile_cont(2 * dev2, 0.5) AS BIGINT) AS mad4
              FROM dev GROUP BY 1)
            SELECT dev.pri, dev.day, dev.cents, dev.med2, mad.mad4,
              2 * dev.cents > dev.med2 AS is_high
            FROM dev JOIN mad USING (pri)
            WHERE 10000 * dev2 > 22239 * mad4
            ORDER BY pri, day""")
  )

  /** Autocorrelation function of the per-priority daily-revenue series at
    * lags 1–5 — the seasonality probe that decides whether x_holt_winters'
    * seasonal term is even warranted. The textbook estimator
    * `r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²` is made integer-EXACT by
    * multiplying through by n² (deviation e_t = n·x_t − Σx, a BIGINT), so
    * no float mean ever enters the arithmetic; cross-products widen to
    * DECIMAL(38,0) on the Spark side and HUGEINT in the oracle, and the
    * published ratio is the truncating-division ppm both engines compute
    * identically. Lag positions are row-numbered WITHIN the observed
    * series (not calendar offsets), so sparse (priority, day) combinations
    * — the sf0.01 reality — need no gap filling.
    *
    * Scale shape: the order book collapses to (priority, day) partials on
    * one high-cardinality exchange; everything after runs on the
    * calendar-bounded series (~2.4k rows per priority), where the lag
    * self-join and the window are structurally flat in corpus size.
    */
  val acf = Q(
    "x_acf",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // truncateLineage on the two multiply-referenced series frames: daily
      // feeds st AND dev0, dev feeds den AND both lag-join sides — without
      // truncation the order-book aggregation re-runs once per reference.
      // Both are calendar-bounded (priorities × days), model-sized at any
      // corpus scale.
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderdate").as("day"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
        .truncateLineage()
      val st = daily.groupBy(col("pri"))
        .agg(count(lit(1)).as("n_days"), sum(col("cents")).as("sv"))
      val dev0 = daily.join(st, "pri")
        .withColumn("e", col("n_days") * col("cents") - col("sv"))
        .withColumn("rn", row_number().over(Window.partitionBy("pri").orderBy("day")))
        .select(col("pri"), col("rn"), col("e"), col("n_days"))
      // Overflow headroom (r14 advice): e² sums approach DECIMAL(38,0)'s 38
      // digits at large SF once multiplied by the 10⁶ ppm scale. Quantize
      // each series so max|e'| ≤ 10⁹ — dsum ≤ days·10¹⁸ and nk·10⁶ stays
      // ~10²⁸ at ANY data scale (days is calendar-bounded). The divisor is
      // derived identically on both engines (pure integer max/div), so the
      // ppm stays bit-exact cross-engine; the quantization error is ≤1 part
      // in 10⁹ of the peak deviation — invisible at ppm resolution.
      val qf = dev0.groupBy(col("pri"))
        .agg(expr("greatest(max(abs(e)) div 1000000000, 1)").as("eq_div"))
      val dev = dev0.join(qf, "pri")
        .withColumn("e", expr("e div eq_div"))
        .select(col("pri"), col("rn"), col("e"), col("n_days"))
        .truncateLineage()
      val den = dev.groupBy(col("pri"))
        .agg(sum(col("e").cast("decimal(38,0)") * col("e").cast("decimal(38,0)")).as("dsum"))
      val lags = s.range(1, 6).select(col("id").as("lag_k"))
      val shifted = dev.select(col("pri"), col("rn"), col("e").as("e2"))
      dev.crossJoin(lags)
        .join(shifted
            .withColumnRenamed("pri", "p2")
            .withColumnRenamed("rn", "rn2"),
          col("pri") === col("p2") && col("rn2") === col("rn") + col("lag_k"))
        .groupBy(col("pri"), col("lag_k"))
        .agg(
          sum(col("e").cast("decimal(38,0)") * col("e2").cast("decimal(38,0)")).as("nk"),
          count(lit(1)).as("n_pairs"),
          first(col("n_days")).as("n_days"))
        .join(den, "pri")
        .select(col("pri"), col("lag_k"), col("n_days"), col("n_pairs"),
          expr("CAST((nk * 1000000) div dsum AS BIGINT)").as("acf_ppm"))
        .orderBy("pri", "lag_k")
    },
    Some("""WITH daily AS (
              SELECT o_orderpriority AS pri, o_orderdate AS day,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
              FROM orders GROUP BY 1, 2),
            st AS (
              SELECT pri, count(*) AS n_days, CAST(sum(cents) AS BIGINT) AS sv
              FROM daily GROUP BY 1),
            dev0 AS (
              SELECT d.pri, n_days, n_days * cents - sv AS e,
                row_number() OVER (PARTITION BY d.pri ORDER BY day) AS rn
              FROM daily d JOIN st USING (pri)),
            qf AS (
              SELECT pri, greatest(max(abs(e)) // 1000000000, 1) AS eq_div
              FROM dev0 GROUP BY 1),
            dev AS (
              SELECT d.pri, n_days, CAST(e // eq_div AS BIGINT) AS e, rn
              FROM dev0 d JOIN qf USING (pri)),
            den AS (
              SELECT pri, sum(CAST(e AS HUGEINT) * e) AS dsum FROM dev GROUP BY 1),
            lags AS (SELECT unnest(range(1, 6)) AS lag_k),
            num AS (
              SELECT d1.pri, lag_k,
                sum(CAST(d1.e AS HUGEINT) * d2.e) AS nk,
                count(*) AS n_pairs, any_value(d1.n_days) AS n_days
              FROM dev d1 CROSS JOIN lags
              JOIN dev d2 ON d1.pri = d2.pri AND d2.rn = d1.rn + lag_k
              GROUP BY 1, 2)
            SELECT num.pri AS pri, lag_k, num.n_days, n_pairs,
              CAST((nk * 1000000) // dsum AS BIGINT) AS acf_ppm
            FROM num JOIN den ON num.pri = den.pri
            ORDER BY num.pri, lag_k""")
  )

  /** Greedy maximum-coverage document selection: pick 5 documents that
    * together cover the most of the top-200 bigram vocabulary — the
    * data-mixing primitive ("which few shards/docs exercise the most of
    * the target vocabulary") behind eval-set seeding and curriculum
    * anchors. Greedy is the (1−1/e)-approximation of Nemhauser et al.;
    * each round picks the document with the largest UNCOVERED-bigram gain
    * (ties → lowest doc_id) and folds its bigrams into the covered set.
    *
    * Sequential selection is unrollable (the x_mmr_diversify precedent):
    * each of the 5 rounds is one distributed aggregate over the
    * (doc, universe-bigram) pair table with the covered set — at most 200
    * strings, model-sized — applied as a literal filter; only the 1-row
    * argmax and the winner's ≤200 covered bigrams are ever collected. The
    * pair table is corpus × 200 bounded and cached across rounds.
    *
    * The universe is bigrams, not unigrams: this generator's unigram
    * vocabulary saturates at 31 tokens (one doc covers it — the vocab-
    * saturation boundary documented on x_simjoin_prefix), while the ~930
    * distinct bigrams keep all five rounds informative at every scale.
    */
  val greedySetcover = Q(
    "x_greedy_setcover",
    (s, d) => {
      import s.implicits._
      val bg = Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
        .select(col("doc_id"),
          explode(
            when(size(col("t")) >= 2,
              transform(
                sequence(lit(0), size(col("t")) - 2),
                i => concat_ws(" ", element_at(col("t"), i + 1), element_at(col("t"), i + 2))))
              .otherwise(array().cast("array<string>"))
          ).as("tok"))
        .distinct()
        // truncateLineage: both the universe ranking and the pair-table join
        // consume bg — without it the bigram explode+distinct runs twice
        .truncateLineage()
      val uni = bg.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("tok")).limit(200).select(col("tok"))
      val dt = bg.join(uni, "tok").cache()
      try {
        var covered = Set.empty[String]
        val picks = Seq.newBuilder[(Long, Long, Long, Long)]
        var rank = 1L
        var exhausted = false
        while (rank <= 5 && !exhausted) {
          val remaining =
            if (covered.isEmpty) dt
            else dt.filter(!col("tok").isin(covered.toSeq: _*))
          // One job per round: the argmax row carries the winner's UNCOVERED
          // bigrams (collect_list over its ≤200 universe tokens) alongside
          // the gain, so the old second per-round collect of the winner's
          // token set is gone. covered folds the same strings: the winner's
          // uncovered set ∪ covered == its full dt token set ∪ covered.
          val top = remaining.groupBy(col("doc_id"))
            .agg(count(lit(1)).as("gain"), collect_list(col("tok")).as("toks"))
            .orderBy(col("gain").desc, col("doc_id")).limit(1).collect()
          if (top.isEmpty) exhausted = true
          else {
            val docId = top.head.getAs[Long]("doc_id")
            val gain = top.head.getAs[Long]("gain")
            covered = covered ++ top.head.getAs[Seq[String]]("toks")
            picks += ((rank, docId, gain, covered.size.toLong))
            rank += 1
          }
        }
        picks.result().toDF("pick_rank", "doc_id", "gain", "covered_total")
          .orderBy("pick_rank")
      } finally dt.unpersist()
    },
    Some {
      val head =
        """WITH toks AS (
             SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t FROM documents),
           bg AS MATERIALIZED (
             SELECT DISTINCT doc_id, unnest(CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
               ELSE CAST([] AS VARCHAR[]) END) AS tok
             FROM toks),
           uni AS (SELECT tok FROM bg GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 200),
           dt AS MATERIALIZED (SELECT doc_id, bg.tok FROM bg JOIN uni USING (tok)),
           c0 AS (SELECT NULL AS tok WHERE false)"""
      val rounds = (1 to 5).map { k =>
        s""",
           r$k AS MATERIALIZED (
             SELECT doc_id, count(*) AS gain FROM dt
             WHERE tok NOT IN (SELECT tok FROM c${k - 1})
             GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1),
           c$k AS MATERIALIZED (
             SELECT tok FROM c${k - 1}
             UNION
             SELECT tok FROM dt WHERE doc_id = (SELECT doc_id FROM r$k))"""
      }.mkString
      val tail = (1 to 5).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS pick_rank, doc_id, gain,
              (SELECT CAST(count(*) AS BIGINT) FROM c$k) AS covered_total FROM r$k"""
      }.mkString("\n           UNION ALL ")
      head + rounds + "\n           " + tail + "\n           ORDER BY pick_rank"
    }
  )

  /** Dominant principal direction of the embedding corpus by power
    * iteration on the Gram (second-moment) matrix — the spectral primitive
    * behind embedding whitening, drift detection, and anisotropy audits
    * (Mu & Viswanath's "all-but-the-top"). The whole computation is
    * integer-exact and therefore fully oracled: embeddings quantize to
    * thousandths (`floor(x·1000)` — floor, not round, which engines
    * half-tie differently), the d×d Gram accumulates exact BIGINT products,
    * entries normalize by `n div 1000` (truncating) so every later bound is
    * data-size-independent, and 8 power-iteration rounds run in scaled
    * integer arithmetic (renormalize to ±10⁶ by the max-|component|,
    * truncating division — the x_pagerank unroll discipline). Sign is
    * canonicalized by making the largest-|v| component positive; a final
    * Rayleigh quotient in the same integer units rides along.
    *
    * Scale shape: ONE pass over the data — `mapPartitions` accumulates a
    * local 64×64 upper triangle (2 080 longs of state per partition, the
    * treeAggregate shape) and emits it as (cell, partial) rows; one
    * partial→final sum over ≤ partitions×2 081 rows; the iteration itself
    * touches only the collected model-sized matrix (the x_kmeans
    * centroid-collect precedent). Row count rides the same pass as cell
    * −1 — no second scan. At 100 TB this is the only shape that works:
    * gram accumulation is embarrassingly parallel and the shuffle is
    * O(partitions·d²), independent of row count.
    *
    * Oracle: DuckDB replays the quantization, the 8.2M-row gram
    * aggregation, and all 8 rounds + sign fix + Rayleigh quotient in
    * HUGEINT CTEs.
    */
  val pcaTopComponent = Q(
    "x_pca_topcomponent",
    (s, d) => {
      import s.implicits._
      val dim = 64
      val cells = dim * (dim + 1) / 2
      val partials = Tables.embeddings(s, d)
        .select(col("embedding").cast("array<double>").as("e"))
        .as[Seq[Double]]
        .mapPartitions { it =>
          val acc = new Array[Long](cells) // upper triangle, row-major
          var rows = 0L
          val q = new Array[Long](dim)
          it.foreach { e =>
            var i = 0
            while (i < dim) { q(i) = math.floor(e(i) * 1000.0).toLong; i += 1 }
            var k = 0
            i = 0
            while (i < dim) {
              var j = i
              while (j < dim) { acc(k) += q(i) * q(j); j += 1; k += 1 }
              i += 1
            }
            rows += 1
          }
          Iterator.single((-1L, rows)) ++ acc.iterator.zipWithIndex.map { case (v, k) => (k.toLong, v) }
        }
        .toDF("cell", "p")
        .groupBy(col("cell")).agg(sum(col("p")).as("v"))
        .collect()

      val n = partials.find(_.getLong(0) == -1L).map(_.getLong(1)).getOrElse(0L)
      val tri = new Array[Long](cells)
      partials.foreach(r => if (r.getLong(0) >= 0) tri(r.getLong(0).toInt) = r.getLong(1))
      val nd = math.max(1L, n / 1000L)
      val g = Array.ofDim[Long](dim, dim)
      var k = 0
      for (i <- 0 until dim; j <- i until dim) {
        val v = tri(k) / nd // truncating, matches DuckDB //
        g(i)(j) = v; g(j)(i) = v; k += 1
      }
      def matvec(v: Array[BigInt]): Array[BigInt] =
        Array.tabulate(dim)(i => (0 until dim).map(j => BigInt(g(i)(j)) * v(j)).sum)
      var v = Array.fill(dim)(BigInt(1000000))
      for (_ <- 1 to 8) {
        val w = matvec(v)
        val m = w.map(_.abs).max
        if (m > 0) v = w.map(x => x * 1000000 / m) // BigInt / truncates toward zero
      }
      val pick = (0 until dim).maxBy(i => (v(i).abs, BigInt(-i)))
      if (v(pick) < 0) v = v.map(-_)
      val w = matvec(v)
      val eigen = (0 until dim).map(i => v(i) * w(i)).sum /
        (0 until dim).map(i => v(i) * v(i)).sum
      (0 until dim).map(i => (i.toLong, v(i).toLong, eigen.toLong))
        .toDF("dim", "component_scaled", "eigen_scaled")
        .orderBy("dim")
    },
    Some {
      val head =
        """WITH idx AS (SELECT unnest(range(0, 64)) AS i),
           q AS MATERIALIZED (
             SELECT vec_id, i,
               CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000.0) AS BIGINT) AS qv
             FROM embeddings CROSS JOIN idx),
           meta AS (SELECT count(*) AS n FROM embeddings),
           gr AS MATERIALIZED (
             SELECT a.i AS i, b.i AS j, sum(a.qv * b.qv) AS gg
             FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2),
           gn AS MATERIALIZED (
             SELECT i, j, CAST(gg AS HUGEINT) // greatest(1, (SELECT n FROM meta) // 1000) AS g
             FROM gr),
           v0 AS MATERIALIZED (SELECT i, CAST(1000000 AS HUGEINT) AS v FROM idx)"""
      val rounds = (1 to 8).map { r =>
        s""",
           w$r AS MATERIALIZED (SELECT gn.i, sum(g * v.v) AS w FROM gn JOIN v${r - 1} v ON gn.j = v.i GROUP BY 1),
           m$r AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w$r),
           v$r AS MATERIALIZED (SELECT i, CASE WHEN (SELECT m FROM m$r) > 0
                     THEN (w * 1000000) // (SELECT m FROM m$r) ELSE 1000000 END AS v FROM w$r)"""
      }.mkString
      val tail =
        """,
           pick AS (SELECT i FROM v8 ORDER BY abs(v) DESC, i LIMIT 1),
           sgn AS MATERIALIZED (SELECT CASE WHEN (SELECT v FROM v8 WHERE i = (SELECT i FROM pick)) < 0
                     THEN -1 ELSE 1 END AS sg),
           vf AS MATERIALIZED (SELECT i, v * (SELECT sg FROM sgn) AS v FROM v8),
           wf AS MATERIALIZED (SELECT gn.i, sum(g * vf.v) AS w FROM gn JOIN vf ON gn.j = vf.i GROUP BY 1),
           ray AS (
             SELECT (SELECT sum(vf.v * wf.w) FROM vf JOIN wf ON vf.i = wf.i) //
                    (SELECT sum(v * v) FROM vf) AS ev)
           SELECT CAST(vf.i AS BIGINT) AS dim, CAST(vf.v AS BIGINT) AS component_scaled,
             CAST((SELECT ev FROM ray) AS BIGINT) AS eigen_scaled
           FROM vf ORDER BY dim"""
      head + rounds + tail
    }
  )

  /** 4-truss of the sparsified event graph
    * ([[graft.functions.GraphOps.truss]], 4 bounded synchronous peel
    * rounds — the fixpoint at every test scale, verified by the spec):
    * every surviving edge sits in ≥ 2 triangles of the surviving subgraph.
    * The truss is the EDGE-strength refinement the registry's k-core
    * lacks — a hub's spokes survive any core but die in the truss, which
    * is why community detection peels trusses. Same data-dependent
    * sparsifier as x_kcore (~1500 canonical edges, divisor from the edge
    * count) so the fold neither saturates at scale nor starves of
    * triangles. The oracle unrolls all 4 peels + the final support pass as
    * MATERIALIZED CTEs (inlined CTE chains expand exponentially — each
    * round references its predecessor 9×).
    */
  val ktruss = Q(
    "x_ktruss",
    (s, d) => {
      val e0raw = Tables.events(s, d)
        .select((col("user_id") % 211).as("a"), (col("event_id") % 211).as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
        .distinct()
        .truncateLineage()
      val divisor = math.max(1L, e0raw.count() / 1500L)
      val e0 = e0raw.filter((col("lo") * 31 + col("hi") * 17) % divisor === 0)
      graft.functions.GraphOps.truss(e0, "lo", "hi", k = 4, rounds = 4)
        .orderBy("lo", "hi")
    },
    Some {
      def round(r: Int) =
        s""",
           t$r AS MATERIALIZED (
             SELECT a.lo AS u, a.hi AS v, b.hi AS w
             FROM e${r - 1} a JOIN e${r - 1} b ON a.lo = b.lo AND a.hi < b.hi
             JOIN e${r - 1} c ON c.lo = a.hi AND c.hi = b.hi),
           s$r AS MATERIALIZED (
             SELECT lo, hi, count(*) AS sup FROM (
               SELECT u AS lo, v AS hi FROM t$r
               UNION ALL SELECT u, w FROM t$r
               UNION ALL SELECT v, w FROM t$r)
             GROUP BY 1, 2)"""
      val head =
        """WITH e0raw AS (
             SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi FROM (
               SELECT user_id % 211 AS a, event_id % 211 AS b FROM events)
             WHERE a <> b),
           dv AS (SELECT GREATEST(1, count(*) // 1500) AS d FROM e0raw),
           e0 AS MATERIALIZED (
             SELECT lo, hi FROM e0raw, dv WHERE (lo * 31 + hi * 17) % dv.d = 0)"""
      val peels = (1 to 4).map { r =>
        round(r) + s""",
           e$r AS MATERIALIZED (
             SELECT e.lo, e.hi FROM e${r - 1} e JOIN s$r USING (lo, hi) WHERE sup >= 2)"""
      }.mkString
      val tail =
        round(5) + """
           SELECT e.lo, e.hi, CAST(COALESCE(s.sup, 0) AS BIGINT) AS sup
           FROM e4 e LEFT JOIN s5 s USING (lo, hi)
           ORDER BY lo, hi"""
      head + peels + tail
    }
  )

  /** Pearson chi-square test of independence on the order-priority ×
    * return-flag contingency table — "does shipping priority move return
    * behavior", the categorical-association audit behind feature selection
    * and A/B sanity checks (the x_abtest_significance sibling for
    * CATEGORICAL outcomes). Exact arithmetic throughout: with O the cell
    * count, rt/ct the margins and N the total, each cell's contribution
    * `(O − rt·ct/N)² / (rt·ct/N)` is cleared of fractions as
    * `(O·N − rt·ct)² · 10⁶ div (N·rt·ct)` — DECIMAL(38,0) on the Spark
    * side, HUGEINT in the oracle, truncating division on both. The total
    * statistic is the exact BIGINT sum of the 15 per-cell ppm terms,
    * windowed onto every row.
    *
    * Scale shape: one fact-fact equi-join on orderkey (the h2 shape), one
    * partial→final count to 15 cells; margins and the chi² fold run on the
    * 15-row frame. Cell cardinality is schema-bounded, so the tail is flat
    * at any data size.
    */
  val chi2Independence = Q(
    "x_chi2_independence",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // lineitem collapses to (orderkey, rf, cnt) BEFORE the join — the
      // partial agg is map-side combinable, so the fact-fact shuffle
      // carries ~1.2 rows per order instead of every line (gen30: 40 → 26 s)
      val lc = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"), col("l_returnflag").as("rf"))
        .agg(count(lit(1)).as("cnt"))
      val cells = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority").as("pri"))
        .join(lc, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("pri"), col("rf"))
        .agg(sum(col("cnt")).as("o"))
      val wp = Window.partitionBy(col("pri"))
      val wr = Window.partitionBy(col("rf"))
      val wAll = Window.partitionBy()
      cells
        .withColumn("rt", sum(col("o")).over(wp))
        .withColumn("ct", sum(col("o")).over(wr))
        .withColumn("n", sum(col("o")).over(wAll))
        .withColumn("cell_chi2_ppm",
          expr("""CAST((CAST(o AS DECIMAL(38,0)) * n - CAST(rt AS DECIMAL(38,0)) * ct)
                       * (CAST(o AS DECIMAL(38,0)) * n - CAST(rt AS DECIMAL(38,0)) * ct)
                       * 1000000 div (CAST(n AS DECIMAL(38,0)) * rt * ct) AS BIGINT)"""))
        .withColumn("chi2_total_ppm", sum(col("cell_chi2_ppm")).over(wAll))
        .select(col("pri"), col("rf"), col("o"), col("rt"), col("ct"), col("n"),
          col("cell_chi2_ppm"), col("chi2_total_ppm"))
        .orderBy("pri", "rf")
    },
    Some("""WITH cells AS (
              SELECT o_orderpriority AS pri, l_returnflag AS rf, count(*) AS o
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              GROUP BY 1, 2),
            m AS (
              SELECT pri, rf, o,
                CAST(sum(o) OVER (PARTITION BY pri) AS BIGINT) AS rt,
                CAST(sum(o) OVER (PARTITION BY rf) AS BIGINT) AS ct,
                CAST(sum(o) OVER () AS BIGINT) AS n
              FROM cells),
            c AS (
              SELECT pri, rf, o, rt, ct, n,
                CAST((CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
                     * (CAST(o AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
                     * 1000000 // (CAST(n AS HUGEINT) * rt * ct) AS BIGINT) AS cell_chi2_ppm
              FROM m)
            SELECT pri, rf, o, rt, ct, n, cell_chi2_ppm,
              CAST(sum(cell_chi2_ppm) OVER () AS BIGINT) AS chi2_total_ppm
            FROM c ORDER BY pri, rf""")
  )

  /** Benford first-digit audit of order totals — the classic fabricated-
    * numbers screen (Nigrini's forensic-accounting test): natural
    * multi-scale amounts follow P(d) = log10(1+1/d). The expected shares
    * are HARDCODED ppm literals (301030 … 45757), not engine-evaluated
    * logs — log10 is not IEEE-exactly-specified, so evaluating it on both
    * engines is precisely the cross-engine float trap the playbook bans.
    * The leading digit comes from the DECIMAL STRING of integer cents
    * (substr of CAST AS VARCHAR) — exact on both engines, no
    * floor(log10(x)) power-of-ten boundary risk.
    *
    * Scale shape: one map-side digit projection, one partial→final count
    * to ≤ 9 rows; everything after is schema-bounded. (TPC-H prices are
    * range-generated, NOT Benford-distributed — the query is the audit
    * instrument, and on this data it correctly reports large deviations.)
    */
  val benfordDigits = Q(
    "x_benford_digits",
    (s, d) => {
      val benford = Seq(
        (1, 301030L), (2, 176091L), (3, 124939L), (4, 96910L), (5, 79181L),
        (6, 66947L), (7, 57992L), (8, 51153L), (9, 45757L))
      import s.implicits._
      val exp = benford.toDF("digit", "benford_ppm")
      val obs = Tables.orders(s, d)
        .select(expr("CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING), 1, 1) AS INT)")
          .as("digit"))
        .groupBy(col("digit"))
        .agg(count(lit(1)).as("observed"))
      val tot = obs.agg(sum(col("observed")).as("n"))
      obs.join(exp, "digit")
        .crossJoin(tot)
        .select(col("digit").cast("long").as("digit"), col("observed"),
          expr("observed * 1000000 div n").as("observed_ppm"),
          col("benford_ppm"),
          abs(expr("observed * 1000000 div n") - col("benford_ppm")).as("abs_dev_ppm"))
        .orderBy("digit")
    },
    Some("""WITH exp AS (
              SELECT * FROM (VALUES
                (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
                (6, 66947), (7, 57992), (8, 51153), (9, 45757)) AS t(digit, benford_ppm)),
            obs AS (
              SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
                count(*) AS observed
              FROM orders GROUP BY 1),
            tot AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM obs)
            SELECT CAST(digit AS BIGINT) AS digit, observed,
              observed * 1000000 // n AS observed_ppm,
              CAST(benford_ppm AS BIGINT) AS benford_ppm,
              abs(observed * 1000000 // n - benford_ppm) AS abs_dev_ppm
            FROM obs JOIN exp USING (digit) CROSS JOIN tot
            ORDER BY digit""")
  )

  /** Kaplan–Meier survival curve for view→purchase conversion latency —
    * the product-limit estimator (Kaplan & Meier 1958) that funnel
    * CONVERSION RATES cannot replace when observation windows are uneven:
    * a user whose log ends 3 days after their first view is CENSORED at
    * day 3, not a non-converter. Subjects are users with a view; the
    * event is the first purchase at/after the first view; censoring time
    * is the user's last observed event. Ties use the standard convention
    * (same-day censorings stay in the risk set for that day's deaths).
    *
    * S(t) folds as a scaled integer: s ← s·(nᵢ−dᵢ) div nᵢ from 10¹²,
    * truncating division both engines (error < one ulp-at-10⁻¹² per event
    * step, deterministic); censor-only times multiply by exactly 1 so the
    * fold over event times only is EXACT, while the risk-set recurrence
    * nᵢ = N − Σ_{t<tᵢ}(d+c) is a plain integer window cumsum over all
    * times. BigInt inside the fold — n·10¹² never overflows at any scale.
    *
    * Scale shape: one per-user aggregate exchange + one co-keyed join for
    * the conditional first-purchase, collapse to per-day (d, c) partials;
    * the fold runs single-task over the CALENDAR-BOUNDED distinct-day
    * series via `repartition(1)` + `mapPartitions` (the CUSUM/DFA
    * sort-scan shape — repartition, not coalesce, so upstream stays
    * parallel). Oracle: recursive CTE over the rn-ordered event days (the
    * x_ewma_anomaly precedent), HUGEINT arithmetic.
    */
  val kaplanMeier = Q(
    "x_kaplan_meier",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts").cast("timestamp_ntz").as("ts"), col("event_type"))
      val perUser = ev.groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("fv"),
          max(col("ts")).as("ls"))
        .filter(col("fv").isNotNull)
      val fp = ev.filter(col("event_type") === "purchase")
        .join(perUser.select(col("user_id"), col("fv")), "user_id")
        .filter(col("ts") >= col("fv"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("fp"))
      val subj = perUser.join(fp, Seq("user_id"), "left")
        .select(
          when(col("fp").isNotNull, datediff(to_date(col("fp")), to_date(col("fv"))))
            .otherwise(datediff(to_date(col("ls")), to_date(col("fv"))))
            .cast("long").as("t"),
          when(col("fp").isNotNull, 1L).otherwise(0L).as("ev"))
      val ta = subj.groupBy(col("t"))
        .agg(sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("c"))
      import org.apache.spark.sql.expressions.Window
      val wCum = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.partitionBy()
      val nr = ta
        .withColumn("n_risk",
          sum(col("d") + col("c")).over(wAll) - coalesce(sum(col("d") + col("c")).over(wCum), lit(0L)))
        .filter(col("d") > 0)
        .select(col("t"), col("n_risk"), col("d"), col("c"))
      nr.repartition(1)
        .sortWithinPartitions(col("t"))
        .as[(Long, Long, Long, Long)]
        .mapPartitions { it =>
          var surv = BigInt(1000000000000L)
          it.map { case (t, nRisk, dd, cc) =>
            surv = surv * (nRisk - dd) / nRisk // BigInt division truncates
            (t, nRisk, dd, cc, surv.toLong)
          }
        }
        .toDF("t_days", "n_risk", "d", "c", "survival_scaled")
        .orderBy("t_days")
    },
    Some("""WITH RECURSIVE per_user AS MATERIALIZED (
              SELECT user_id,
                min(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS fv,
                max(CAST(ts AS TIMESTAMP)) AS ls
              FROM events GROUP BY 1),
            fp AS MATERIALIZED (
              SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS fp
              FROM events e JOIN per_user u USING (user_id)
              WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= u.fv
              GROUP BY 1),
            subj AS (
              SELECT CASE WHEN fp IS NOT NULL
                       THEN date_diff('day', CAST(fv AS DATE), CAST(fp AS DATE))
                       ELSE date_diff('day', CAST(fv AS DATE), CAST(ls AS DATE)) END AS t,
                     CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS ev
              FROM per_user u LEFT JOIN fp USING (user_id)
              WHERE fv IS NOT NULL),
            ta AS (
              SELECT t, CAST(sum(ev) AS BIGINT) AS d, CAST(sum(1 - ev) AS BIGINT) AS c
              FROM subj GROUP BY 1),
            nr AS (
              SELECT t, d, c,
                CAST(sum(d + c) OVER () AS BIGINT)
                  - COALESCE(CAST(sum(d + c) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n_risk
              FROM ta),
            evt AS MATERIALIZED (
              SELECT row_number() OVER (ORDER BY t) AS rn, t, n_risk, d, c
              FROM nr WHERE d > 0),
            km AS (
              SELECT rn, t, n_risk, d, c,
                CAST(1000000000000 AS HUGEINT) * (n_risk - d) // n_risk AS s
              FROM evt WHERE rn = 1
              UNION ALL
              SELECT e.rn, e.t, e.n_risk, e.d, e.c, km.s * (e.n_risk - e.d) // e.n_risk
              FROM km JOIN evt e ON e.rn = km.rn + 1)
            SELECT t AS t_days, n_risk, d, c, CAST(s AS BIGINT) AS survival_scaled
            FROM km ORDER BY t_days""")
  )

  /** Theil–Sen robust trend estimate per priority: the MEDIAN of all
    * pairwise slopes of the daily-revenue series — the 29%-breakdown
    * regression that one fat-finger day cannot bend, where h26's OLS moves
    * with every outlier (the regression-family analogue of
    * x_mad_outliers vs the z-score). Each pair's slope is made integer:
    * `(Δcents · 10⁶) div Δdays` (truncating both engines; Δdays > 0 by
    * construction), and the median uses the DOUBLED-domain trick so the
    * even-count midpoint stays an exact BIGINT.
    *
    * Scale honesty: the pair space is quadratic — in the CALENDAR, not the
    * corpus. The order book collapses to (priority, day) partials first
    * (one high-cardinality exchange); the all-pairs join then runs over
    * ~2.4k-row series whose length is fixed by the date range, so the
    * ~3M-pairs-per-priority cost is IDENTICAL at sf0.01 and at 100 TB.
    * That is the same bounded-final-stage argument as x_acf, and the
    * opposite of the x_entity_resolution pigeonhole trap (where the
    * quadratic was in the DATA).
    */
  val theilSen = Q(
    "x_theil_sen",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // truncateLineage: the series feeds BOTH pair-join sides and the
      // n_pairs count — without it the order-book aggregation re-runs per
      // reference. Calendar-bounded (priorities × days), model-sized at any
      // corpus scale.
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderdate").as("day"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
        .withColumn("x", datediff(col("day"), min(col("day")).over(Window.partitionBy("pri"))).cast("long"))
        .select(col("pri"), col("x"), col("cents"))
        .truncateLineage()
      // Salted pair generation (the window-skew doctrine): joining on pri
      // alone is 5 keys — 5-way parallelism for a 29M-pair cross product
      // (measured 66 s). Bucketing the right side by x mod 16 and exploding
      // the left over all buckets makes the join key (pri, bucket) — 80-way
      // parallel, the identical pair set. 66 s → ~4 s.
      val buckets = 16
      val aExp = daily.withColumn("bb", explode(lit((0 until buckets).toArray)))
      // The checkpointed daily carries its window's hash-by-pri layout — 5
      // non-empty partitions — and the pair join's PROBE side inherits it,
      // capping every pair pass at 5-way parallelism (measured: ~4 s/pass at
      // sf0.1). Re-spreading the 12k probe rows over (pri, bucket) restores
      // full-width probing; the explicit shuffle-partition count keeps AQE
      // from coalescing the tiny exchange back to one task.
      val b = daily.select(col("pri").as("pri2"), col("x").as("x2"), col("cents").as("cents2"))
        .withColumn("bucket", pmod(col("x2"), lit(buckets)).cast("int"))
        .repartition(
          // tolerate a non-numeric session value (AQE's "auto") — fall back
          // to defaultParallelism rather than NumberFormatException
          scala.util.Try(s.conf.get("spark.sql.shuffle.partitions").toInt)
            .getOrElse(s.sparkContext.defaultParallelism),
          col("pri2"), col("bucket"))
      val pairsAll = aExp.join(b,
          col("pri") === col("pri2") && col("bb") === col("bucket") && col("x2") > col("x"))
      // nullif divisor: Catalyst pushes later slope-referencing filters into
      // the join condition AHEAD of the x2 > x residual (observed: the
      // bracket filter below evaluated the division on x2 == x candidate
      // rows → ANSI DIVIDE_BY_ZERO). x2 <= x rows never reach the output
      // (the join condition drops them), so a NULL slope there changes
      // nothing — it only makes the stray pre-filter evaluation lawful.
      val slopeCol = expr("((cents2 - cents) * 1000000 div nullif(x2 - x, 0)) * 2")
      // The pair stream is REGENERATED per median pass rather than
      // materialized: the generating join is broadcast-shaped over the
      // checkpointed 12k-row daily (~1 s per pass at full width), while a
      // 14M-row localCheckpoint measured SLOWER end-to-end and parks
      // ~400 MB on executor-local storage for no scale benefit.
      val pairs = pairsAll.select(col("pri"), slopeCol.as("slope2"))
      // n_pairs needs no pair scan: days are distinct per priority, so the
      // x2 > x join emits exactly C(n_days, 2) rows — computed from the
      // checkpointed daily series (5 rows, model-sized collect).
      val nPairs = daily.groupBy(col("pri")).agg(count(lit(1)).as("n_days"))
        .select(col("pri"), expr("n_days * (n_days - 1) div 2").as("n_pairs"))
      val k1e = expr("(n_pairs + 1) div 2")
      val k2e = expr("n_pairs div 2 + 1")
      // Exact-median fallback / small-series path: one shuffle of the pairs
      // + an in-partition Tungsten sort per priority (row_number), the two
      // middle ranks filtered, their min/max midpoint the same exact BIGINT
      // (slopes are even by the doubled domain, so the halving is exact).
      def medianBySort(p: org.apache.spark.sql.DataFrame) = {
        val wMed = Window.partitionBy(col("pri")).orderBy(col("slope2"))
        p.withColumn("rn", row_number().over(wMed))
          .join(broadcast(nPairs), "pri")
          .filter(col("rn") === k1e || col("rn") === k2e)
          .groupBy(col("pri"), col("n_pairs"))
          .agg(expr("(min(slope2) + max(slope2)) div 2").as("slope_med2_ppm"))
          .select(col("pri"), col("n_pairs"), col("slope_med2_ppm"))
      }
      // Main path — deterministic sample-bracket selection (guide §2.3/§8:
      // never shuffle the heavy stream; decide with small rows). The pair
      // stream is REGENERATED per pass from the checkpointed 12k-row daily
      // (a broadcast-shaped join — far cheaper than shuffling or sorting
      // 14M pair rows):
      //   pass 1: a 1/64 deterministic sample (xxhash64 of the pair's (x,
      //           x2) identity, value-independent) is rank-windowed per
      //           priority; the sample order statistics around the scaled
      //           median rank ± 6·sqrt(m) give bracket values [vlo, vhi].
      //   pass 2: ONE map-side-collapsing aggregation counts, per priority,
      //           the pairs strictly below vlo and inside [vlo, vhi] —
      //           exact integers that PROVE the global ranks k1, k2 fall
      //           inside the bracket (if not — sampling tail odds ~1e-8 —
      //           the full-sort fallback runs; exactness never rests on the
      //           sample).
      //   pass 3: only the bracket rows (≈ 1e-2 of the pairs) are rank-
      //           windowed; global rank = below + local rank selects the
      //           two middle order statistics.
      // All three passes end in aggregations or tiny windows, so nothing
      // pair-sized is ever sorted or shuffled — the former all-pairs
      // row_number window (and the mapGroups sort before it) was the
      // slowest stage in the whole bench.
      val npRows = nPairs.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val total  = npRows.values.sum
      val out =
        if (total < 2000000L) medianBySort(pairs)
        else {
          // the 1/64 sample predicate hashes the pair IDENTITY (x, x2) —
          // value-independent, so sample ranks are uniform in the global
          // rank order; Catalyst pushes it into the join condition, so
          // unsampled candidates never reach the slope projection
          val sampId = pmod(xxhash64(col("pri"), col("x"), col("x2")), lit(64L)) === 0
          val samp   = pairsAll.filter(sampId).select(col("pri"), slopeCol.as("slope2"))
          val sw  = Window.partitionBy(col("pri"))
          val swo = sw.orderBy(col("slope2"))
          val br = samp
            .join(broadcast(nPairs), "pri")
            .withColumn("m", count(lit(1)).over(sw))
            .withColumn("srn", row_number().over(swo))
            .withColumn("d", expr("CAST(6.0 * sqrt(CAST(m AS DOUBLE)) AS BIGINT) + 10"))
            .withColumn("rlo", greatest(lit(1L), expr("(m * ((n_pairs + 1) div 2)) div n_pairs - d")))
            .withColumn("rhi", least(col("m"), expr("(m * (n_pairs div 2 + 1)) div n_pairs + d")))
            .filter(col("srn") === col("rlo") || col("srn") === col("rhi"))
            .select(col("pri"), col("srn").cast("long").as("srn"), col("rlo"), col("slope2"))
            .collect() // ≤ 2 rows per priority
          val vlo = br.filter(r => r.getLong(1) == r.getLong(2))
            .map(r => (r.getString(0), r.getLong(3))).toMap
          val vhi = br.filterNot(r => r.getLong(1) == r.getLong(2))
            .map(r => (r.getString(0), r.getLong(3))).toMap
          val brSeq = npRows.keys.toSeq.flatMap { p =>
            vlo.get(p).map(lo => (p, lo, vhi.getOrElse(p, lo)))
          }
          val brDf = broadcast(
            s.createDataFrame(brSeq).toDF("pri", "vlo", "vhi"))
          val cnts = pairs.join(brDf, "pri")
            .groupBy(col("pri"))
            .agg(
              sum(when(col("slope2") < col("vlo"), 1L).otherwise(0L)).as("below"),
              sum(when(col("slope2").between(col("vlo"), col("vhi")), 1L).otherwise(0L)).as("inside"))
            .collect()
            .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
          // a zero-pair priority (single-day series) emits no row on either
          // path — exclude it from the bracket proof
          val ok = brSeq.nonEmpty && npRows.filter(_._2 > 0).forall { case (p, np) =>
            val k1 = (np + 1) / 2; val k2 = np / 2 + 1
            cnts.get(p).exists { case (blw, ins) => k1 > blw && k2 <= blw + ins } &&
              brSeq.exists(_._1 == p)
          }
          if (!ok) medianBySort(pairs) // exactness never rests on the sample
          else {
            val belowDf = broadcast(
              s.createDataFrame(cnts.toSeq.map { case (p, (blw, _)) => (p, blw) })
                .toDF("pri", "below"))
            pairs.join(brDf, "pri")
              .filter(col("slope2").between(col("vlo"), col("vhi")))
              .withColumn("rn", row_number().over(
                Window.partitionBy(col("pri")).orderBy(col("slope2"))))
              .join(belowDf, "pri")
              .join(broadcast(nPairs), "pri")
              .filter(col("rn") + col("below") === k1e ||
                col("rn") + col("below") === k2e)
              .groupBy(col("pri"), col("n_pairs"))
              .agg(expr("(min(slope2) + max(slope2)) div 2").as("slope_med2_ppm"))
              .select(col("pri"), col("n_pairs"), col("slope_med2_ppm"))
          }
        }
      out.orderBy("pri")
    },
    Some("""WITH daily AS (
              SELECT o_orderpriority AS pri, o_orderdate AS day,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
              FROM orders GROUP BY 1, 2),
            xs AS (
              SELECT pri,
                CAST(date_diff('day', min(day) OVER (PARTITION BY pri), day) AS BIGINT) AS x,
                cents
              FROM daily),
            pairs AS (
              SELECT a.pri, ((b.cents - a.cents) * 1000000 // (b.x - a.x)) * 2 AS slope2
              FROM xs a JOIN xs b ON a.pri = b.pri AND b.x > a.x)
            SELECT pri, count(*) AS n_pairs,
              CAST(quantile_cont(slope2, 0.5) AS BIGINT) AS slope_med2_ppm
            FROM pairs GROUP BY pri ORDER BY pri""")
  )

  /** Degree assortativity of the sparsified event graph — Newman's Pearson
    * correlation between the degrees at the two ends of an edge (PRL 2002):
    * positive = hubs attach to hubs (social nets), negative = hubs attach
    * to leaves (the internet). Completes the graph-stats family next to
    * triangles/truss/core. Each undirected edge contributes both
    * orientations (the standard convention), which makes the two marginals
    * identical, so r = (m·Σxy − S²) / (m·Σx² − S²) — entirely BIGINT on
    * this fold (deg ≤ 211), published as truncating ppm with a NULL guard
    * for the degenerate regular graph (denominator 0). Same data-dependent
    * sparsifier as x_kcore/x_ktruss — on the SATURATED fold every degree
    * is equal and r is undefined, the same reason the core/truss use it.
    *
    * Scale shape: one degree aggregation, two vocabulary-sized joins, one
    * 1-row reduce. On a real graph this is the by-the-book shape: degrees
    * are a partial→final count; the edge⋈degree joins shuffle |E| rows.
    */
  val graphAssortativity = Q(
    "x_graph_assortativity",
    (s, d) => {
      val e0raw = Tables.events(s, d)
        .select((col("user_id") % 211).as("a"), (col("event_id") % 211).as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
        .distinct()
        .truncateLineage()
      val divisor = math.max(1L, e0raw.count() / 1500L)
      val ek = e0raw.filter((col("lo") * 31 + col("hi") * 17) % divisor === 0)
      val e = ek.select(col("lo").as("src"), col("hi").as("dst"))
        .union(ek.select(col("hi").as("src"), col("lo").as("dst")))
      val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      e.join(deg.select(col("node").as("src"), col("deg").as("x")), "src")
        .join(deg.select(col("node").as("dst"), col("deg").as("y")), "dst")
        .agg(
          count(lit(1)).as("m"),
          sum(col("x")).as("sx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("m"), col("sx"), col("sxy"), col("sxx"),
          when(col("m") * col("sxx") - col("sx") * col("sx") === 0, lit(null).cast("long"))
            .otherwise(expr("(m * sxy - sx * sx) * 1000000 div (m * sxx - sx * sx)"))
            .as("assortativity_ppm"))
    },
    Some("""WITH e0raw AS (
              SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi FROM (
                SELECT user_id % 211 AS a, event_id % 211 AS b FROM events)
              WHERE a <> b),
            dv AS (SELECT GREATEST(1, count(*) // 1500) AS d FROM e0raw),
            ek AS (SELECT lo, hi FROM e0raw, dv WHERE (lo * 31 + hi * 17) % dv.d = 0),
            e AS (SELECT lo AS src, hi AS dst FROM ek UNION ALL SELECT hi, lo FROM ek),
            deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
            j AS (
              SELECT dx.deg AS x, dy.deg AS y
              FROM e JOIN deg dx ON e.src = dx.node JOIN deg dy ON e.dst = dy.node),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
              FROM j)
            SELECT m, sx, sxy, sxx,
              CASE WHEN m * sxx - sx * sx = 0 THEN NULL
                   ELSE (m * sxy - sx * sx) * 1000000 // (m * sxx - sx * sx) END
                AS assortativity_ppm
            FROM agg""")
  )

  /** Classical seasonal decomposition of the daily event-count series —
    * trend (centered 7-day moving average), seasonal (day-of-week mean of
    * the detrended series), residual: the additive decomposition
    * (Macaulay/Census Method I) that tells a monitoring pipeline whether a
    * dip is "it's Sunday" or a real regression, and the honest precursor
    * to x_holt_winters' fitted model. All three components are published
    * in milli-units with truncating division only — trend = 1000·Σwindow
    * div |window|, seasonal = Σdetrended div count — so both engines
    * agree bit-for-bit; edge days keep their shrunken centered window
    * (the standard convention for series ends).
    *
    * Scale shape: the log collapses to per-day counts first (one
    * high-cardinality exchange); the moving window, the 7-row day-of-week
    * aggregate, and the residual all run on the calendar-bounded series.
    */
  val seasonalDecompose = Q(
    "x_seasonal_decompose",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("day_idx", unix_date(col("day")))
      val w7 = Window.orderBy(col("day_idx")).rangeBetween(-3, 3)
      val trended = daily
        .withColumn("s7", sum(col("n")).over(w7))
        .withColumn("c7", count(col("n")).over(w7))
        .withColumn("trend_milli", expr("(1000 * s7) div c7"))
        .withColumn("detr_milli", expr("1000 * n - trend_milli"))
        .withColumn("dow", dayofweek(col("day")).cast("long") - 1)
      val seas = trended.groupBy(col("dow"))
        .agg(expr("sum(detr_milli) div count(*)").as("seasonal_milli"))
      trended.join(seas, "dow")
        .select(col("day"), col("n"), col("trend_milli"), col("seasonal_milli"),
          (col("detr_milli") - col("seasonal_milli")).as("residual_milli"))
        .orderBy("day")
    },
    Some("""WITH daily AS (
              SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
                count(*) AS n
              FROM events GROUP BY 1),
            tr AS (
              SELECT day, n,
                (1000 * CAST(sum(n) OVER w AS BIGINT)) // CAST(count(n) OVER w AS BIGINT)
                  AS trend_milli
              FROM daily
              WINDOW w AS (ORDER BY CAST(day - DATE '1970-01-01' AS BIGINT)
                           RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
            dt AS (
              SELECT day, n, trend_milli, 1000 * n - trend_milli AS detr_milli,
                CAST(dayofweek(day) AS BIGINT) AS dow
              FROM tr),
            se AS (
              SELECT dow, CAST(sum(detr_milli) AS BIGINT) // count(*) AS seasonal_milli
              FROM dt GROUP BY 1)
            SELECT day, n, trend_milli, seasonal_milli,
              detr_milli - seasonal_milli AS residual_milli
            FROM dt JOIN se USING (dow)
            ORDER BY day""")
  )

  /** Wald–Wolfowitz runs test on the daily-revenue series — "are the
    * above-median and below-median days randomly interleaved, or does the
    * series trend/cluster?" (far fewer runs than expected = momentum; far
    * more = oscillation). The residual-randomness audit that tells you
    * whether x_holt_winters left structure on the table. Observed runs
    * come from the rn-difference-free islands trick (a lag comparison —
    * one window over the calendar-bounded series); the expected-runs
    * baseline E = 1 + 2·n₊·n₋/n is published in exact truncating
    * milli-units. Ties (= median) side with "below" via a strict `>`.
    */
  val runsTest = Q(
    "x_runs_test",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderdate").as("day"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      val med = daily
        .select(col("pri"), (col("cents") * 2).as("c2"))
        .groupBy(col("pri"))
        .agg(expr("CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY c2) AS BIGINT)").as("med2"))
      val wd = Window.partitionBy(col("pri")).orderBy(col("day"))
      daily.join(med, "pri")
        .withColumn("pos", (col("cents") * 2 > col("med2")).cast("long"))
        .withColumn("brk",
          when(lag(col("pos"), 1).over(wd).isNull ||
            lag(col("pos"), 1).over(wd) =!= col("pos"), 1L).otherwise(0L))
        .groupBy(col("pri"))
        .agg(
          count(lit(1)).as("n_days"),
          sum(col("pos")).as("n_pos"),
          (count(lit(1)) - sum(col("pos"))).as("n_neg"),
          sum(col("brk")).as("n_runs"))
        .withColumn("expected_runs_milli",
          expr("1000 + (2000 * n_pos * n_neg) div n_days"))
        .orderBy("pri")
    },
    Some("""WITH daily AS (
              SELECT o_orderpriority AS pri, o_orderdate AS day,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
              FROM orders GROUP BY 1, 2),
            med AS (
              SELECT pri, CAST(quantile_cont(2 * cents, 0.5) AS BIGINT) AS med2
              FROM daily GROUP BY 1),
            sg AS (
              SELECT d.pri, d.day,
                CASE WHEN 2 * d.cents > m.med2 THEN 1 ELSE 0 END AS pos
              FROM daily d JOIN med m USING (pri)),
            br AS (
              SELECT pri, pos,
                CASE WHEN lag(pos) OVER (PARTITION BY pri ORDER BY day) IS NULL
                       OR lag(pos) OVER (PARTITION BY pri ORDER BY day) <> pos
                     THEN 1 ELSE 0 END AS brk
              FROM sg),
            agg AS (
              SELECT pri, CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(pos) AS BIGINT) AS n_pos,
                CAST(count(*) - sum(pos) AS BIGINT) AS n_neg,
                CAST(sum(brk) AS BIGINT) AS n_runs
              FROM br GROUP BY 1)
            SELECT pri, n_days, n_pos, n_neg, n_runs,
              1000 + (2000 * n_pos * n_neg) // n_days AS expected_runs_milli
            FROM agg ORDER BY pri""")
  )

  /** Rolling-origin forecast backtest: seasonal-naive (ŷ_t = y_{t−7})
    * versus last-value naive (ŷ_t = y_{t−1}) on the per-priority daily
    * revenue, scored by MAPE — the held-out evaluation harness that
    * decides whether x_holt_winters' seasonality earns its keep (a model
    * that can't beat y_{t−7} shouldn't ship). Every fold is an exact
    * integer: APE = |y−ŷ|·10⁶ div y, MAPE = ΣAPE div folds. Folds are
    * calendar joins on (priority, day−k) — the x_acf lag-join shape —
    * restricted to days where BOTH baselines have a predecessor, so the
    * two MAPEs average the identical fold set.
    */
  val forecastBacktest = Q(
    "x_forecast_backtest",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderdate").as("day"))
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
        .withColumn("di", unix_date(col("day").cast("date")).cast("long"))
        .select(col("pri"), col("di"), col("cents"))
      def shifted(k: Int, name: String) = daily
        .select(col("pri").as(s"p$k"), (col("di") + k).as(s"d$k"), col("cents").as(name))
      daily
        .join(shifted(7, "f7"), col("pri") === col("p7") && col("di") === col("d7"))
        .join(shifted(1, "f1"), col("pri") === col("p1") && col("di") === col("d1"))
        .select(col("pri"),
          expr("abs(cents - f7) * 1000000 div cents").as("ape7"),
          expr("abs(cents - f1) * 1000000 div cents").as("ape1"))
        .groupBy(col("pri"))
        .agg(
          count(lit(1)).as("n_folds"),
          expr("sum(ape7) div count(*)").as("mape_seasonal_ppm"),
          expr("sum(ape1) div count(*)").as("mape_naive_ppm"))
        .orderBy("pri")
    },
    Some("""WITH daily AS (
              SELECT o_orderpriority AS pri,
                CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
              FROM orders GROUP BY 1, 2),
            j AS (
              SELECT a.pri,
                abs(a.cents - s7.cents) * 1000000 // a.cents AS ape7,
                abs(a.cents - s1.cents) * 1000000 // a.cents AS ape1
              FROM daily a
              JOIN daily s7 ON a.pri = s7.pri AND a.di = s7.di + 7
              JOIN daily s1 ON a.pri = s1.pri AND a.di = s1.di + 1)
            SELECT pri, CAST(count(*) AS BIGINT) AS n_folds,
              CAST(sum(ape7) AS BIGINT) // count(*) AS mape_seasonal_ppm,
              CAST(sum(ape1) AS BIGINT) // count(*) AS mape_naive_ppm
            FROM j GROUP BY pri ORDER BY pri""")
  )

  /** Skip-gram co-occurrence counts in a ±2 window — the (center, context)
    * pair table every word2vec/GloVe-style embedding trainer consumes, and
    * the wider-window sibling of x_collocations_pmi's adjacent bigrams.
    * Pairs are generated INSIDE the token array (nested `transform` +
    * bounds-guarded `element_at`, then one explode) — no positional
    * self-join, no shuffle until the count aggregation, which is the only
    * shape that survives a 100 TB corpus. Directional pairs (the standard
    * convention: each window slot contributes one (w, c)); top-20 by
    * count with deterministic ties is a TakeOrdered.
    */
  val skipgramCooc = Q(
    "x_skipgram_cooc",
    (s, d) =>
      Tables.documents(s, d)
        .select(TextAnalysis.tokens(col("text")).as("t"))
        .select(explode(expr(
          """flatten(transform(t, (w, i) ->
               filter(transform(array(-2, -1, 1, 2), o ->
                 CASE WHEN i + o >= 0 AND i + o < size(t)
                      THEN struct(w AS w, element_at(t, i + o + 1) AS c) END),
                 p -> p IS NOT NULL)))""")).as("p"))
        .select(col("p.w"), col("p.c"))
        .groupBy(col("w"), col("c"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w"), col("c"))
        .limit(20),
    Some("""WITH toks AS (
              SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
            pr AS (
              SELECT unnest(flatten(list_transform(range(1, len(t) + 1), i ->
                list_filter(list_transform([-2, -1, 1, 2], o ->
                  CASE WHEN i + o >= 1 AND i + o <= len(t) THEN [t[i], t[i + o]] END),
                  p -> p IS NOT NULL)))) AS p
              FROM toks)
            SELECT p[1] AS w, p[2] AS c, count(*) AS cnt
            FROM pr GROUP BY 1, 2
            ORDER BY cnt DESC, w, c LIMIT 20""")
  )

  /** CUPED variance reduction for the A/B readout (Deng et al., WSDM'13):
    * adjust each user's experiment-period purchase count by their
    * PRE-period count, y′ = y − θ(x − x̄) with θ = cov(x,y)/var(x) pooled
    * over both arms — the covariate is pre-assignment, so the adjustment
    * is unbiased and typically cuts the metric variance 40–60%. Completes
    * the experimentation family around x_abtest_significance (same
    * user_id % 2 assignment). Pre/post halves split at the series'
    * midpoint day, derived in-query.
    *
    * Exact arithmetic throughout: θ in truncating ppm from n²-cleared
    * integer sums (cov = n·Σxy − ΣxΣy, var = n·Σx² − (Σx)², the x_acf
    * clearing), and each arm's adjusted total folds per-user terms
    * 10⁶·n·y − θ_ppm·(n·x − Σx) in DECIMAL(38,0)/HUGEINT. A zero
    * pre-variance degenerates θ to 0 (raw means) on both engines.
    *
    * Scale shape: one per-user aggregate over the purchase log (hash
    * exchange on user_id, the population completed by a left join to the
    * distinct-user frame), a 1-row pooled-stats broadcast, then a 2-row
    * arm aggregate — the log is scanned once.
    */
  val abCuped = Q(
    "x_ab_cuped",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          unix_date(col("ts").cast("date")).cast("long").as("di"),
          col("event_type"))
      val mid = ev.agg(expr("(min(di) + max(di) + 1) div 2").as("mid"))
      val purch = ev.filter(col("event_type") === "purchase")
        .crossJoin(mid)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("di") < col("mid"), 1L).otherwise(0L)).as("x"),
          sum(when(col("di") >= col("mid"), 1L).otherwise(0L)).as("y"))
      val u = ev.select(col("user_id")).distinct()
        .join(purch, Seq("user_id"), "left")
        .select(col("user_id"), pmod(col("user_id"), lit(2)).as("arm"),
          coalesce(col("x"), lit(0L)).as("x"), coalesce(col("y"), lit(0L)).as("y"))
      val st = u.agg(
        count(lit(1)).as("nu"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .select(col("nu"), col("sx"),
          expr("""CASE WHEN CAST(nu AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx = 0
                       THEN CAST(0 AS BIGINT)
                       ELSE CAST((CAST(nu AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy)
                                 * 1000000
                                 div (CAST(nu AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx)
                            AS BIGINT) END""").as("theta_ppm"))
      u.crossJoin(st)
        .groupBy(col("arm"))
        .agg(
          count(lit(1)).as("n_users"),
          sum(col("y")).as("sy_a"),
          sum(expr("""CAST(1000000 AS DECIMAL(38,0)) * nu * y
                      - CAST(theta_ppm AS DECIMAL(38,0)) * (CAST(nu AS DECIMAL(38,0)) * x - sx)"""))
            .as("adj"),
          first(col("nu")).as("nu"), first(col("theta_ppm")).as("theta_ppm"))
        .select(col("arm"), col("n_users"),
          expr("(1000000 * sy_a) div n_users").as("mean_y_ppm"),
          expr("CAST(adj div (CAST(nu AS DECIMAL(38,0)) * n_users) AS BIGINT)").as("mean_y_adj_ppm"),
          col("theta_ppm"))
        .orderBy("arm")
    },
    Some("""WITH ev AS (
              SELECT user_id,
                CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS di,
                event_type
              FROM events),
            mid AS (SELECT (min(di) + max(di) + 1) // 2 AS mid FROM ev),
            purch AS (
              SELECT user_id,
                CAST(sum(CASE WHEN di < mid THEN 1 ELSE 0 END) AS BIGINT) AS x,
                CAST(sum(CASE WHEN di >= mid THEN 1 ELSE 0 END) AS BIGINT) AS y
              FROM ev CROSS JOIN mid
              WHERE event_type = 'purchase' GROUP BY user_id),
            u AS (
              SELECT a.user_id, a.user_id % 2 AS arm,
                COALESCE(p.x, 0) AS x, COALESCE(p.y, 0) AS y
              FROM (SELECT DISTINCT user_id FROM ev) a
              LEFT JOIN purch p USING (user_id)),
            st AS (
              SELECT CAST(count(*) AS BIGINT) AS nu, CAST(sum(x) AS BIGINT) AS sx,
                CASE WHEN CAST(count(*) AS HUGEINT) * sum(x * x)
                          - CAST(sum(x) AS HUGEINT) * sum(x) = 0
                     THEN CAST(0 AS BIGINT)
                     ELSE CAST((CAST(count(*) AS HUGEINT) * sum(x * y)
                                - CAST(sum(x) AS HUGEINT) * sum(y)) * 1000000
                               // (CAST(count(*) AS HUGEINT) * sum(x * x)
                                  - CAST(sum(x) AS HUGEINT) * sum(x)) AS BIGINT) END
                  AS theta_ppm
              FROM u)
            SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
              1000000 * CAST(sum(y) AS BIGINT) // count(*) AS mean_y_ppm,
              CAST(sum(CAST(1000000 AS HUGEINT) * nu * y
                       - CAST(theta_ppm AS HUGEINT) * (CAST(nu AS HUGEINT) * x - sx))
                   // (CAST(any_value(nu) AS HUGEINT) * count(*)) AS BIGINT) AS mean_y_adj_ppm,
              any_value(theta_ppm) AS theta_ppm
            FROM u CROSS JOIN st
            GROUP BY arm ORDER BY arm""")
  )

  /** Sample-ratio mismatch check — the first gate of every experiment
    * readout: a χ² test of the observed arm counts against the designed
    * 50/50 split (an SRM means the assignment itself is broken and no
    * downstream metric can be trusted). With a + b = n the statistic
    * collapses to (a−b)²/n — one exact integer — compared against the
    * hardcoded χ²₁ 95% critical value in ppm (3 841 459; the literal, not
    * an engine-evaluated distribution function).
    */
  val srmCheck = Q(
    "x_srm_check",
    (s, d) =>
      Tables.events(s, d)
        .select(col("user_id")).distinct()
        .groupBy(pmod(col("user_id"), lit(2)).as("arm"))
        .agg(count(lit(1)).as("n"))
        .agg(
          sum(col("n")).as("n_users"),
          sum(when(col("arm") === 0, col("n")).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 1, col("n")).otherwise(0L)).as("n_b"))
        .select(col("n_users"), col("n_a"), col("n_b"),
          expr("((n_a - n_b) * (n_a - n_b) * 1000000) div n_users").as("srm_chi2_ppm"),
          expr("((n_a - n_b) * (n_a - n_b) * 1000000) div n_users < 3841459").as("is_balanced")),
    Some("""WITH arms AS (
              SELECT user_id % 2 AS arm, count(*) AS n
              FROM (SELECT DISTINCT user_id FROM events) GROUP BY 1)
            , agg AS (
              SELECT CAST(sum(n) AS BIGINT) AS n_users,
                CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END) AS BIGINT) AS n_a,
                CAST(sum(CASE WHEN arm = 1 THEN n ELSE 0 END) AS BIGINT) AS n_b
              FROM arms)
            SELECT n_users, n_a, n_b,
              CAST((n_a - n_b) * (n_a - n_b) * 1000000 // n_users AS BIGINT) AS srm_chi2_ppm,
              (n_a - n_b) * (n_a - n_b) * 1000000 // n_users < 3841459 AS is_balanced
            FROM agg""")
  )

  val qs: Seq[Q] = Seq(collocationsPmi, madOutliers, acf, greedySetcover, pcaTopComponent,
    ktruss, chi2Independence, benfordDigits, kaplanMeier, theilSen, graphAssortativity,
    seasonalDecompose, runsTest, forecastBacktest, skipgramCooc, abCuped, srmCheck)
}
