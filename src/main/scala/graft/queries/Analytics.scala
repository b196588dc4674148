package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalysis

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

  val qs: Seq[Q] = Seq(collocationsPmi, madOutliers)
}
