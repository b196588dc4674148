package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Layout.LineageOps

/** Row-pattern and frontier analytics — the MATCH_RECOGNIZE / skyline /
  * changepoint family (SQL:2016 row pattern matching; Börzsönyi's skyline
  * operator; Page's CUSUM chart). Spark has none of the three natively;
  * each is expressed here in its scale-right execution shape: one hash
  * exchange on the natural key, then a linear in-partition scan with O(1)
  * or O(frontier) state — never a self-join, never a per-row window over
  * the whole partition.
  */
object Patterns {

  /** MATCH_RECOGNIZE-style contiguous row-pattern match over the event log:
    * `PARTITION BY user_id ORDER BY ts  PATTERN (V+ C P)` with
    * V = view, C = click, P = purchase, any other event type breaking
    * contiguity, greedy `V+`, and `AFTER MATCH SKIP PAST LAST ROW`
    * (matches of this pattern are provably disjoint, so the skip rule is
    * structural, not a tie-break). Per match: the view-run length, the
    * first view's time, and the purchase time — the "browse burst that
    * converted" unit. This is SQL:2016 row pattern matching (Trino/Flink
    * `MATCH_RECOGNIZE`), which Spark lacks.
    *
    * Execution shape: ONE hash exchange on user_id, a spillable
    * in-partition sort on (user_id, ts, event_id), then a single linear
    * DFA scan via `mapPartitions` — state is three longs regardless of
    * pattern depth or user history length (the Flink-CEP per-key NFA as a
    * sort-scan; no per-user buffering, no self-join per pattern step).
    * Pattern complexity changes CPU per row only, never shuffle volume —
    * the property that keeps this viable at 100 TB.
    *
    * Oracle: the window-function replay of the same semantics — maximal
    * V-runs via the rn-difference islands trick, anchors where a C row is
    * immediately followed by P and immediately preceded by the run's end.
    */
  val matchRecognize = Q(
    "x_match_recognize",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(
          col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("tm"),
          col("event_id"),
          when(col("event_type") === "view", "V")
            .when(col("event_type") === "click", "C")
            .when(col("event_type") === "purchase", "P")
            .otherwise("O").as("cls"))
        .as[(Long, Long, Long, String)]
      ev.repartition(col("user_id"))
        .sortWithinPartitions(col("user_id"), col("tm"), col("event_id"))
        .mapPartitions { it =>
          new Iterator[(Long, Long, Long, Long)] {
            private var curUser = Long.MinValue
            private var st      = 0 // 0 = empty, 1 = in V-run, 2 = V+ C seen
            private var nV      = 0L
            private var vStart  = 0L
            private var nxt: (Long, Long, Long, Long) = _
            private def advance(): Unit = {
              nxt = null
              while (nxt == null && it.hasNext) {
                val (u, tm, _, cls) = it.next()
                if (u != curUser) { curUser = u; st = 0 }
                cls match {
                  case "V" =>
                    if (st == 1) nV += 1
                    else { st = 1; nV = 1; vStart = tm }
                  case "C" =>
                    st = if (st == 1) 2 else 0
                  case "P" =>
                    if (st == 2) nxt = (curUser, nV, vStart, tm)
                    st = 0
                  case _ => st = 0
                }
              }
            }
            advance()
            def hasNext: Boolean = nxt != null
            def next(): (Long, Long, Long, Long) = { val r = nxt; advance(); r }
          }
        }
        .toDF("user_id", "n_views", "start_us", "end_us")
        .orderBy("user_id", "start_us")
    },
    Some("""WITH e AS (
              SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tm, event_id,
                CASE event_type WHEN 'view' THEN 'V' WHEN 'click' THEN 'C'
                  WHEN 'purchase' THEN 'P' ELSE 'O' END AS cls,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events),
            v AS (
              SELECT user_id, rn, tm,
                rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
              FROM e WHERE cls = 'V'),
            vrun AS (
              SELECT user_id, grp, max(rn) AS run_end_rn,
                CAST(count(*) AS BIGINT) AS n_views, min(tm) AS start_us
              FROM v GROUP BY 1, 2),
            a AS (
              SELECT user_id, rn, cls,
                lead(cls) OVER (PARTITION BY user_id ORDER BY rn) AS nc,
                lead(tm)  OVER (PARTITION BY user_id ORDER BY rn) AS ntm
              FROM e)
            SELECT a.user_id, r.n_views, r.start_us, a.ntm AS end_us
            FROM a JOIN vrun r ON r.user_id = a.user_id AND r.run_end_rn = a.rn - 1
            WHERE a.cls = 'C' AND a.nc = 'P'
            ORDER BY a.user_id, r.start_us""")
  )

  /** Skyline (Pareto frontier) of customers over three maximize-dimensions:
    * lifetime spend, order count, recency — "who is undominated" is the
    * multi-criteria segmentation question a single score hides
    * (Börzsönyi/Kossmann/Stocker, ICDE'01). A customer is on the skyline
    * iff no other customer is ≥ on all three dims and > on at least one.
    *
    * Execution shape (the distributed BNL two-phase): aggregate per
    * customer (one exchange), LOCAL skyline per partition via a running
    * in-partition frontier (each dominated point dies on its executor —
    * at 100 TB this is the pruning step; correlated dimensions shrink
    * partitions to near-√n survivors), then the surviving candidates —
    * union of local frontiers, orders of magnitude smaller than the
    * input — collapse through one final single-task pass of the same
    * filter. Anti-correlated dimensions can inflate the frontier toward n;
    * that is a property of the OPERATOR (the skyline itself is that big),
    * not of this plan. Oracle: the quadratic NOT EXISTS dominance
    * definition (DuckDB's IEJoin handles the inequality pairs).
    */
  val skyline = Q(
    "x_skyline",
    (s, d) => {
      import s.implicits._
      val per = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("spend_cents"),
          count(lit(1)).as("n_orders"),
          max(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))).as("latest_d"))
        .select(col("custkey"), col("spend_cents"), col("n_orders"),
          col("latest_d").cast("long").as("latest_d"))
        .as[(Long, Long, Long, Long)]

      def dominates(b: (Long, Long, Long, Long), a: (Long, Long, Long, Long)): Boolean =
        b._2 >= a._2 && b._3 >= a._3 && b._4 >= a._4 &&
          (b._2 > a._2 || b._3 > a._3 || b._4 > a._4)

      def localSkyline(it: Iterator[(Long, Long, Long, Long)]): Iterator[(Long, Long, Long, Long)] = {
        val frontier = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        it.foreach { p =>
          if (!frontier.exists(f => dominates(f, p))) {
            val keep = frontier.filterNot(f => dominates(p, f))
            frontier.clear(); frontier ++= keep; frontier += p
          }
        }
        frontier.iterator
      }

      // repartition (NOT coalesce): coalesce(1) would fold phase 1 into the
      // same single task and erase its parallelism — the exchange is the
      // point, and it carries only the already-pruned candidates.
      per.mapPartitions(localSkyline _)   // phase 1: prune on the executors
        .repartition(1)
        .mapPartitions(localSkyline _)    // phase 2: candidates only
        .toDF("custkey", "spend_cents", "n_orders", "latest_d")
        .withColumn("latest_day", expr("date_add(DATE '1992-01-01', CAST(latest_d AS INT))"))
        .drop("latest_d")
        .orderBy("custkey")
    },
    Some("""WITH p AS (
              SELECT o_custkey AS custkey,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents,
                count(*) AS n_orders,
                max(CAST(o_orderdate AS DATE)) AS latest_day
              FROM orders GROUP BY 1)
            SELECT custkey, spend_cents, n_orders, latest_day
            FROM p a
            WHERE NOT EXISTS (
              SELECT 1 FROM p b
              WHERE b.spend_cents >= a.spend_cents AND b.n_orders >= a.n_orders
                AND b.latest_day >= a.latest_day
                AND (b.spend_cents > a.spend_cents OR b.n_orders > a.n_orders
                     OR b.latest_day > a.latest_day))
            ORDER BY custkey""")
  )

  /** CUSUM changepoint detection (Page, 1954) over the per-priority daily
    * order series — the one-sided upper chart that catches small sustained
    * LEVEL SHIFTS the EWMA 2× spike gate sleeps through:
    * S_t = max(0, S_{t−1} + (x_t − μ − k)), alarm when S_t > h, S resets
    * after an alarm (restart monitoring). μ is the truncating mean of the
    * series' first 28 in-control days, allowance k = μ/20, threshold
    * h = μ — all in integer milli-units with truncating division (Scala
    * `/` == DuckDB `//`), so the fold is bit-exact cross-engine.
    *
    * Same execution shape as the EWMA/Holt siblings: inherently sequential
    * per series → typed per-key fold (`flatMapGroups`), state ONE long per
    * key, series bounded by the calendar, keys scale out by partition.
    * Oracle: recursive CTE carrying S, joined to a warmup-stats CTE.
    */
  val cusumChangepoint = Q(
    "x_cusum_changepoint",
    (s, d) => {
      import s.implicits._
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("priority"),
          to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n"))
      daily
        .select(col("priority"), col("day").cast("string"), col("n"))
        .as[(String, String, Long)]
        .groupByKey(_._1)
        .flatMapGroups { (p, it) =>
          val series = it.toArray.sortBy(_._2)
          val warm   = series.take(28)
          val mu     = warm.map(_._3 * 1000L).sum / warm.length
          val k      = mu / 20
          var sPrev  = 0L
          series.iterator.map { case (_, day, n) =>
            val sPre  = math.max(0L, sPrev + (1000 * n - mu - k))
            val alarm = if (sPre > mu) 1L else 0L
            sPrev = if (alarm == 1L) 0L else sPre
            (p, day, n, sPre, alarm)
          }
        }
        .toDF("priority", "day", "n", "cusum_milli", "alarm")
        .select(col("priority"), col("day").cast("date").as("day"), col("n"),
          col("cusum_milli"), col("alarm"))
        .orderBy("priority", "day")
    },
    Some("""WITH RECURSIVE base AS (
              SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
                count(*) AS n,
                row_number() OVER (PARTITION BY o_orderpriority
                  ORDER BY CAST(o_orderdate AS DATE)) AS rn
              FROM orders GROUP BY 1, 2),
            warm AS (
              -- CAST: DuckDB widens sum(BIGINT) to HUGEINT, which would
              -- otherwise propagate through the recurrence into the output
              SELECT priority,
                CAST(sum(1000 * n) FILTER (WHERE rn <= 28) //
                  LEAST(max(rn), 28) AS BIGINT) AS mu
              FROM base GROUP BY priority),
            rec AS (
              SELECT b.priority, b.day, b.n, b.rn,
                GREATEST(CAST(0 AS BIGINT),
                  1000 * b.n - w.mu - w.mu // 20) AS s_pre,
                CASE WHEN GREATEST(CAST(0 AS BIGINT), 1000 * b.n - w.mu - w.mu // 20) > w.mu
                     THEN CAST(0 AS BIGINT)
                     ELSE GREATEST(CAST(0 AS BIGINT), 1000 * b.n - w.mu - w.mu // 20)
                END AS s_carry
              FROM base b JOIN warm w USING (priority) WHERE b.rn = 1
              UNION ALL
              SELECT b.priority, b.day, b.n, b.rn,
                GREATEST(CAST(0 AS BIGINT),
                  r.s_carry + 1000 * b.n - w.mu - w.mu // 20),
                CASE WHEN GREATEST(CAST(0 AS BIGINT),
                       r.s_carry + 1000 * b.n - w.mu - w.mu // 20) > w.mu
                     THEN CAST(0 AS BIGINT)
                     ELSE GREATEST(CAST(0 AS BIGINT),
                       r.s_carry + 1000 * b.n - w.mu - w.mu // 20)
                END
              FROM rec r
              JOIN base b ON b.priority = r.priority AND b.rn = r.rn + 1
              JOIN warm w ON w.priority = b.priority)
            SELECT r.priority, r.day, r.n, r.s_pre AS cusum_milli,
              CAST(CASE WHEN r.s_pre > w.mu THEN 1 ELSE 0 END AS BIGINT) AS alarm
            FROM rec r JOIN warm w USING (priority)
            ORDER BY priority, day""")
  )

  /** EXACT set-similarity self-join via positional prefix filtering
    * (Chaudhuri/Ganti/Kaushik ICDE'06; Xiao's PPJoin) — the lossless
    * complement to the MinHash-LSH candidate path: word-4-gram-shingle
    * Jaccard ≥ 0.8 pairs with NO probabilistic recall argument — the same
    * shingle kernel and threshold family as `x_dedup_minhash_lsh`, so the
    * lossless join directly audits the LSH shortcut. The theorem: order every
    * doc's tokens by ascending global frequency (rarest first); two sets
    * with J ≥ t MUST share a token among each one's first
    * |x| − ⌈t·|x|⌉ + 1 tokens — so the candidate join runs on PREFIX
    * tokens only, and prefix tokens are by construction the RARE ones, so
    * the per-token join buckets stay small (the stopword bucket never
    * forms: stopwords sort last and fall outside every prefix). The length
    * and positional filters (PPJoin, Xiao et al. WWW'08) prune inside the
    * join itself, in exact integer arithmetic so both engines draw the
    * boundary identically on exact-J=0.8 pairs.
    *
    * Pruning power is a property of shingle RARITY, and this corpus is the
    * adversarial case — a bounded generator vocabulary. Measured: 2-gram
    * vocabulary saturates at ~931 shingles → 9.3M join rows at sf0.1 (the
    * pigeonhole-blocking trap in token clothes); 4-grams hold rarity to
    * ~2.5k rows at sf0.1 and ~150k at gen1, then saturate (~920k distinct
    * against 500k docs at gen10 → 5.4M survivors even after the positional
    * filter). Natural-text vocabularies are unbounded, so rarity holds at
    * corpus scale; where a vocabulary DOES saturate, the similarity-pruned
    * LSH path (`x_dedup_minhash_lsh`) is the scale route and this exact
    * join is its bounded-scope audit.
    *
    * Shape: token-frequency aggregate (one exchange), frequency join back,
    * per-doc rank window (partition = doc_id: millions of small
    * partitions), prefix-token equi-join, exact verify in-row via sorted
    * array intersection — no all-pairs anywhere, every shuffle on a
    * high-cardinality key. The oracle replays candidate generation AND
    * verification in SQL; PatternsSpec pins losslessness against exact
    * all-pairs at sf0.001.
    */
  val simjoinPrefix = Q(
    "x_simjoin_prefix",
    (s, d) => {
      val t = 0.8
      // truncateLineage: the shingle kernel (the query's most expensive
      // projection) feeds the token explode, the size frame AND both verify
      // joins — unpinned it re-runs once per consumer (guide §1.2 / the r17
      // curation-pipeline stage-pin treatment).
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.DedupOps.shingles(col("text"), 4).as("t"))
        .truncateLineage()
      val tok  = toks.select(col("doc_id"), explode(col("t")).as("w"))
      val freq = tok.groupBy("w").agg(count(lit(1)).as("freq"))
      val sz   = toks.select(col("doc_id"), size(col("t")).cast("long").as("n"))
      val pref = tok.join(freq, "w")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id")).orderBy(col("freq"), col("w"))))
        .join(sz, "doc_id")
        // prefix length n − ⌈0.8n⌉ + 1, in EXACT integer arithmetic
        // (⌈4n/5⌉ = (4n+4) div 5): a float 0.8 here could shift the
        // boundary on exact-J=0.8 pairs differently per engine.
        .filter(col("rn") <= col("n") - expr("(4 * n + 4) div 5") + 1)
        .select(col("doc_id"), col("w"), col("rn").cast("long").as("rn"), col("n"))
      // PPJoin length + positional filters IN the join, also integer-exact:
      // J ≥ 0.8 forces 5·|y| ≥ 4·|x|, and at the first shared prefix token
      // the total overlap is at most 1 + min(remaining positions on either
      // side), while J ≥ t needs overlap ≥ t/(1+t)·(|x|+|y|) = 4/9·(…) —
      // both are necessary conditions, so pruning on them stays lossless
      // (we keep a pair if ANY shared prefix token passes, weaker than
      // classic PPJoin's first-match evaluation, lossless a fortiori).
      val cand = pref.as("a").join(pref.as("b"),
          col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id") &&
            col("b.n") * 5 >= col("a.n") * 4 &&
            col("a.n") * 5 >= col("b.n") * 4 &&
            (least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn")) + 1) * 9 >=
              (col("a.n") + col("b.n")) * 4)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
      cand
        .join(toks.select(col("doc_id").as("id_a"), col("t").as("ta")), "id_a")
        .join(toks.select(col("doc_id").as("id_b"), col("t").as("tb")), "id_b")
        .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("double"))
        .withColumn("jaccard",
          col("inter") / (size(col("ta")) + size(col("tb")) - col("inter")))
        .filter(col("jaccard") >= t)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
    },
    Some("""WITH words AS (
              SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
              FROM documents),
            toks AS (
              SELECT doc_id,
                CASE WHEN len(t) >= 4
                  THEN list_distinct(list_transform(range(1, len(t) - 2),
                         i -> array_to_string(t[i:i+3], ' ')))
                  ELSE [array_to_string(t, ' ')] END AS t
              FROM words),
            tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
            f AS (SELECT w, count(*) AS freq FROM tok GROUP BY w),
            pref AS (
              SELECT doc_id, w, rn, n FROM (
                SELECT tok.doc_id, tok.w,
                  row_number() OVER (PARTITION BY tok.doc_id ORDER BY f.freq, tok.w) AS rn,
                  count(*) OVER (PARTITION BY tok.doc_id) AS n
                FROM tok JOIN f USING (w))
              WHERE rn <= n - (4 * n + 4) // 5 + 1),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM pref a JOIN pref b ON a.w = b.w AND a.doc_id < b.doc_id
              WHERE b.n * 5 >= a.n * 4
                AND a.n * 5 >= b.n * 4
                AND (LEAST(a.n - a.rn, b.n - b.rn) + 1) * 9 >=
                    (a.n + b.n) * 4),
            v AS (
              SELECT c.id_a, c.id_b,
                CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE) /
                  (len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t))) AS jaccard
              FROM cand c
              JOIN toks ta ON ta.doc_id = c.id_a
              JOIN toks tb ON tb.doc_id = c.id_b)
            SELECT id_a, id_b, jaccard FROM v WHERE jaccard >= 0.8
            ORDER BY id_a, id_b""")
  )

  /** Incremental exact similarity join — the O(delta) face of
    * [[simjoinPrefix]], mirroring the x_er_incremental discipline: a delta
    * batch of documents (doc_id ≡ 0 mod 10, the arriving 10%) is joined
    * against the FROZEN base corpus, reporting every qualifying pair that
    * INVOLVES a delta doc. The prefix theorem holds for ANY fixed total
    * token order — frequency is only the pruning heuristic — so prefixes
    * on BOTH sides use the base corpus' frozen frequency order (tokens
    * unseen in the base rank rarest at freq 0), exactly what a persisted
    * prefix index gives an ingest pipeline: only delta prefix tokens probe
    * the index, base-base pairs are never revisited, and the result is
    * still LOSSLESS for delta-involving pairs under that order. Same
    * integer-exact PPJoin length/positional filters.
    */
  val simjoinIncremental = Q(
    "x_simjoin_incremental",
    (s, d) => {
      // truncateLineage: the shingle kernel feeds the token explode and both
      // verify joins (3 re-derivations unpinned — the r17 curation-pipeline
      // stage-pin treatment, guide §1.2).
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.DedupOps.shingles(col("text"), 4).as("t"),
          (pmod(col("doc_id"), lit(10)) === 0).as("is_delta"))
        .truncateLineage()
      val tok = toks.select(col("doc_id"), col("is_delta"), explode(col("t")).as("w"))
      val baseFreq = tok.filter(!col("is_delta"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      val pref = tok.join(baseFreq, Seq("w"), "left")
        .withColumn("freq", coalesce(col("freq"), lit(0L)))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id")).orderBy(col("freq"), col("w"))))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
        .filter(col("rn") <= col("n") - expr("(4 * n + 4) div 5") + 1)
        .select(col("doc_id"), col("is_delta"), col("w"),
          col("rn").cast("long").as("rn"), col("n"))
        // pinned: the prefix frame (freq join + 2 windows) feeds BOTH sides
        // of the candidate join with DIFFERENT filters, so exchange reuse
        // cannot dedupe the re-derivation the way it does for the
        // x_simjoin_prefix self-join
        .truncateLineage()
      val prefDelta = pref.filter(col("is_delta"))
        .select(col("doc_id").as("d_id"), col("w"),
          col("rn").as("d_rn"), col("n").as("d_n"))
      val cand = prefDelta.join(pref,
          prefDelta("w") === pref("w") && col("d_id") =!= col("doc_id") &&
            col("n") * 5 >= col("d_n") * 4 &&
            col("d_n") * 5 >= col("n") * 4 &&
            (least(col("d_n") - col("d_rn"), col("n") - col("rn")) + 1) * 9 >=
              (col("d_n") + col("n")) * 4)
        .select(least(col("d_id"), col("doc_id")).as("id_a"),
          greatest(col("d_id"), col("doc_id")).as("id_b"))
        .distinct()
      cand
        .join(toks.select(col("doc_id").as("id_a"), col("t").as("ta")), "id_a")
        .join(toks.select(col("doc_id").as("id_b"), col("t").as("tb")), "id_b")
        .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("double"))
        .withColumn("jaccard",
          col("inter") / (size(col("ta")) + size(col("tb")) - col("inter")))
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
    },
    Some("""WITH words AS (
              SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
              FROM documents),
            toks AS (
              SELECT doc_id, doc_id % 10 = 0 AS is_delta,
                CASE WHEN len(t) >= 4
                  THEN list_distinct(list_transform(range(1, len(t) - 2),
                         i -> array_to_string(t[i:i+3], ' ')))
                  ELSE [array_to_string(t, ' ')] END AS t
              FROM words),
            tok AS (SELECT doc_id, is_delta, unnest(t) AS w FROM toks),
            f AS (SELECT w, count(*) AS freq FROM tok WHERE NOT is_delta GROUP BY w),
            pref AS (
              SELECT doc_id, is_delta, w, rn, n FROM (
                SELECT tok.doc_id, tok.is_delta, tok.w,
                  row_number() OVER (PARTITION BY tok.doc_id
                    ORDER BY COALESCE(f.freq, 0), tok.w) AS rn,
                  count(*) OVER (PARTITION BY tok.doc_id) AS n
                FROM tok LEFT JOIN f USING (w))
              WHERE rn <= n - (4 * n + 4) // 5 + 1),
            cand AS (
              SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS id_a,
                GREATEST(a.doc_id, b.doc_id) AS id_b
              FROM pref a JOIN pref b ON a.w = b.w AND a.doc_id <> b.doc_id
              WHERE a.is_delta
                AND b.n * 5 >= a.n * 4
                AND a.n * 5 >= b.n * 4
                AND (LEAST(a.n - a.rn, b.n - b.rn) + 1) * 9 >=
                    (a.n + b.n) * 4),
            v AS (
              SELECT c.id_a, c.id_b,
                CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE) /
                  (len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t))) AS jaccard
              FROM cand c
              JOIN toks ta ON ta.doc_id = c.id_a
              JOIN toks tb ON tb.doc_id = c.id_b)
            SELECT id_a, id_b, jaccard FROM v WHERE jaccard >= 0.8
            ORDER BY id_a, id_b""")
  )

  /** Sweep-line max-concurrency: how many shipments are simultaneously
    * in flight each day (interval = ship date + a deterministic
    * 1 + (orderkey + linenumber) mod 14 day transit, end-exclusive) — the
    * resource-concurrency audit (open connections, concurrent jobs,
    * overlapping reservations) as the classic +1/−1 boundary sweep.
    *
    * Shape: the interval set collapses to per-day NET deltas first (one
    * hash exchange on a calendar-bounded key), and only then does the
    * running sum scan the ~2.4k day rows in one bounded partition — the
    * x_equidepth lesson: never a global window over row-scale data; the
    * window input here is CALENDAR-sized at any data scale. Duplicate
    * (orderkey, linenumber) rows are collapsed before the sweep (interval
    * identity is a set property).
    */
  val maxConcurrency = Q(
    "x_max_concurrency",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          to_date(col("l_shipdate")).as("ship"))
        .distinct()
        .withColumn("dur",
          (lit(1) + pmod(col("l_orderkey") + col("l_linenumber"), lit(14))).cast("int"))
      val deltas = li.select(col("ship").as("day"), lit(1L).as("delta"))
        .unionByName(li.select(date_add(col("ship"), col("dur")).as("day"),
          lit(-1L).as("delta")))
        .groupBy("day").agg(sum("delta").as("net"))
      deltas
        .withColumn("open", sum(col("net")).over(
          Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("day"), col("open"))
        .orderBy("day")
    },
    Some("""WITH li AS (
              SELECT DISTINCT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship
              FROM lineitem),
            iv AS (
              SELECT l_orderkey, l_linenumber, ship,
                CAST(1 + (l_orderkey + l_linenumber) % 14 AS INT) AS dur
              FROM li),
            deltas AS (
              SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM (
                SELECT ship AS day, 1 AS delta FROM iv
                UNION ALL
                SELECT ship + dur AS day, -1 AS delta FROM iv)
              GROUP BY day)
            SELECT day,
              CAST(sum(net) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS open
            FROM deltas ORDER BY day""")
  )

  /** Incremental skyline maintenance — the O(frontier + delta) face of
    * [[skyline]]: orders arriving after the cutoff (1995-06-01) are the
    * delta. All three dimensions are MONOTONE under new orders (spend and
    * count only grow, recency only advances), which gives the maintenance
    * theorem: a customer dominated in the base stays dominated (its
    * dominator — transitively, some frontier member — either received no
    * delta and is unchanged, or improved), so the new frontier is the
    * skyline of (old frontier ∪ re-aggregated delta-touched customers)
    * ONLY. Per increment the engine touches the frontier (tiny), the delta,
    * and the delta customers' histories — at 100 TB the per-customer
    * aggregate table is the persisted state, making the re-aggregation
    * O(delta) too; here it is recomputed to keep the query self-contained.
    *
    * Oracle: the FULL skyline recompute over all orders — equality to full
    * recompute IS the incremental contract (same oracle as [[skyline]]).
    */
  val skylineIncremental = Q(
    "x_skyline_incremental",
    (s, d) => {
      import s.implicits._
      val cutoff = "1995-06-01"
      val orders = Tables.orders(s, d)

      def aggStats(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("o_custkey").as("custkey"))
        .agg(
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("spend_cents"),
          count(lit(1)).as("n_orders"),
          max(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))).as("latest_d"))
        .select(col("custkey"), col("spend_cents"), col("n_orders"),
          col("latest_d").cast("long").as("latest_d"))
        .as[(Long, Long, Long, Long)]

      def dominates(b: (Long, Long, Long, Long), a: (Long, Long, Long, Long)): Boolean =
        b._2 >= a._2 && b._3 >= a._3 && b._4 >= a._4 &&
          (b._2 > a._2 || b._3 > a._3 || b._4 > a._4)

      def localSkyline(it: Iterator[(Long, Long, Long, Long)]): Iterator[(Long, Long, Long, Long)] = {
        val frontier = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        it.foreach { p =>
          if (!frontier.exists(f => dominates(f, p))) {
            val keep = frontier.filterNot(f => dominates(p, f))
            frontier.clear(); frontier ++= keep; frontier += p
          }
        }
        frontier.iterator
      }

      // frozen base frontier (pruned distributed, collapsed once)
      val baseFrontier = aggStats(orders.filter(to_date(col("o_orderdate")) < lit(cutoff)))
        .mapPartitions(localSkyline _).repartition(1).mapPartitions(localSkyline _)
      // delta-touched customers, re-aggregated over their FULL history
      val deltaCust = orders.filter(to_date(col("o_orderdate")) >= lit(cutoff))
        .select(col("o_custkey")).distinct()
      val updated = aggStats(orders.join(deltaCust, Seq("o_custkey"), "left_semi"))
      // maintenance: skyline of frontier ∪ updated, with updated customers'
      // stale frontier rows dropped first
      baseFrontier.toDF("custkey", "spend_cents", "n_orders", "latest_d")
        .join(deltaCust.select(col("o_custkey").as("custkey")), Seq("custkey"), "left_anti")
        .as[(Long, Long, Long, Long)]
        .unionByName(updated)
        .mapPartitions(localSkyline _).repartition(1).mapPartitions(localSkyline _)
        .toDF("custkey", "spend_cents", "n_orders", "latest_d")
        .withColumn("latest_day", expr("date_add(DATE '1992-01-01', CAST(latest_d AS INT))"))
        .drop("latest_d")
        .orderBy("custkey")
    },
    Some("""WITH p AS (
              SELECT o_custkey AS custkey,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents,
                count(*) AS n_orders,
                max(CAST(o_orderdate AS DATE)) AS latest_day
              FROM orders GROUP BY 1)
            SELECT custkey, spend_cents, n_orders, latest_day
            FROM p a
            WHERE NOT EXISTS (
              SELECT 1 FROM p b
              WHERE b.spend_cents >= a.spend_cents AND b.n_orders >= a.n_orders
                AND b.latest_day >= a.latest_day
                AND (b.spend_cents > a.spend_cents OR b.n_orders > a.n_orders
                     OR b.latest_day > a.latest_day))
            ORDER BY custkey""")
  )

  /** Error-burst detection — the quantifier-only row pattern `E{3,}`
    * (three or more CONSECUTIVE error events per user, any other event
    * breaking the run): the reliability signal "this user is stuck in a
    * failure loop", which a plain error COUNT cannot see (60 scattered
    * errors are noise; 3 back-to-back are an incident). Same execution
    * shape as [[matchRecognize]] — one exchange, in-partition sort, linear
    * run-length scan with two longs of state — demonstrating the DFA
    * machinery generalizes across pattern shapes. Maximal runs only (a
    * 5-error run is ONE burst of 5, not three overlapping bursts of 3).
    *
    * Oracle: the rn-difference islands replay over error rows positioned
    * in the FULL per-user sequence (consecutive full-sequence rns = a run).
    */
  val errorBurst = Q(
    "x_error_burst",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(
          col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("tm"),
          col("event_id"),
          (col("event_type") === "error").as("isErr"))
        .as[(Long, Long, Long, Boolean)]
      ev.repartition(col("user_id"))
        .sortWithinPartitions(col("user_id"), col("tm"), col("event_id"))
        .mapPartitions { it =>
          new Iterator[(Long, Long, Long, Long)] {
            private var curUser  = Long.MinValue
            private var runLen   = 0L
            private var runStart = 0L
            private var lastTm   = 0L
            private var pendingUser = Long.MinValue
            private var nxt: (Long, Long, Long, Long) = _
            private def closeRun(): Unit =
              if (runLen >= 3) nxt = (pendingUser, runLen, runStart, lastTm)
            private def advance(): Unit = {
              nxt = null
              while (nxt == null && it.hasNext) {
                val (u, tm, _, isErr) = it.next()
                if (u != curUser) { closeRun(); curUser = u; runLen = 0 }
                if (isErr) {
                  if (runLen == 0L) runStart = tm
                  runLen += 1; lastTm = tm; pendingUser = u
                } else { closeRun(); runLen = 0 }
              }
              if (nxt == null && !it.hasNext && runLen > 0) { closeRun(); runLen = 0 }
            }
            advance()
            def hasNext: Boolean = nxt != null
            def next(): (Long, Long, Long, Long) = { val r = nxt; advance(); r }
          }
        }
        .toDF("user_id", "n_errors", "start_us", "end_us")
        .orderBy("user_id", "start_us")
    },
    Some("""WITH e AS (
              SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tm,
                (event_type = 'error') AS is_err,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events),
            er AS (
              SELECT user_id, rn, tm,
                rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
              FROM e WHERE is_err)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_errors,
              min(tm) AS start_us, max(tm) AS end_us
            FROM er GROUP BY user_id, grp
            HAVING count(*) >= 3
            ORDER BY user_id, start_us""")
  )

  val qs: Seq[Q] = Seq(matchRecognize, skyline, cusumChangepoint, simjoinPrefix,
    maxConcurrency, skylineIncremental, errorBurst, simjoinIncremental)
}
