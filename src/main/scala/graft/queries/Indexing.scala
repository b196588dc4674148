package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Layout.LineageOps

/** Round-11 families: search indexing (inverted index, boolean retrieval,
  * winnowing passage fingerprints), sketch completion (count-min), lakehouse
  * completion (SCD Type 2, zone-map pruning), and multi-touch attribution.
  * Every query is row-level oracled; token hashes use the engine-neutral
  * md5 primitive (the x_dedup_simhash precedent) so the full pipelines
  * replay in DuckDB.
  */
object Indexing {

  /** Inverted index over the document corpus: per-token document frequency,
    * total term frequency, and the head of the sorted posting list — the
    * build step of BM25/boolean serving ([[Extensions.bm25Search]] scores,
    * this materializes the index itself).
    *
    * Scale shape: (token, doc) partial aggregation first (map-side combine
    * collapses within-doc repeats), then ONE token exchange shared by the
    * df/tf aggregate and the posting-head window. The posting head is capped
    * by a row_number BEFORE collect_list — the h28 discipline — so a
    * stopword's aggregation buffer holds ≤10 doc ids, never a corpus-sized
    * posting list; full posting lists at 100 TB would write out the capped
    * frame partitioned by token prefix instead of collecting anything.
    * Output is the top-50 tokens by df under a total order.
    */
  val invertedIndex = Q(
    "x_inverted_index",
    (s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(graft.functions.TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("tok"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
      val stats = tok.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))
      // Salted two-phase bottom-k for the posting head: a window partitioned
      // by token alone degenerates to |vocab| sorted partitions — the gen30
      // ladder measured 6× for 3× data on the 31-word synthetic vocab (and a
      // stopword token at 100 TB is the same trap). Phase 1 takes each
      // (token, doc_id mod 32) bucket's 10 smallest (a superset of the global
      // 10 smallest — every global winner lives in SOME bucket), restoring
      // vocab×32 parallelism over the corpus-sized frame; phase 2 re-ranks
      // the ≤320 survivors per token — bounded, skew-free.
      val headCand = tok
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("tok"), pmod(col("doc_id"), lit(32)))
            .orderBy(col("doc_id"))))
        .filter(col("rn") <= 10)
      val head = headCand
        .withColumn("rn2", row_number().over(
          Window.partitionBy(col("tok")).orderBy(col("doc_id"))))
        .filter(col("rn2") <= 10)
        .groupBy(col("tok"))
        .agg(array_join(sort_array(collect_list(col("doc_id"))), ",").as("postings_head"))
      stats.join(head, Seq("tok"))
        .select(col("tok"), col("df"), col("tf_total"), col("postings_head"))
        .orderBy(desc("df"), asc("tok"))
        .limit(50)
    },
    Some("""WITH t AS (
              SELECT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
              WHERE tok <> ''),
            g AS (SELECT tok, doc_id, count(*) AS tf FROM t GROUP BY 1, 2),
            st AS (
              SELECT tok, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total
              FROM g GROUP BY tok),
            hd AS (
              SELECT tok,
                array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings_head
              FROM (SELECT tok, doc_id,
                      row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
                    FROM g) z
              WHERE rn <= 10 GROUP BY tok)
            SELECT st.tok, st.df, st.tf_total, hd.postings_head
            FROM st JOIN hd ON st.tok = hd.tok
            ORDER BY st.df DESC, st.tok LIMIT 50""")
  )

  /** Conjunctive boolean retrieval through the inverted-index shape: the
    * corpus's two highest-df terms (data-driven, so the same query replays
    * at any scale factor) intersected — docs containing BOTH. The term set
    * is a 2-row broadcast; the (doc, token) frame semi-joins against it and
    * a HAVING count(distinct)=k finishes the intersection, so the corpus
    * pays one doc_id exchange over only the rows matching ANY query term —
    * the posting-intersection cost model, never a scan per term.
    */
  val booleanSearch = Q(
    "x_boolean_search",
    (s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(graft.functions.TextAnalysis.tokens(col("text"))).as("tok"))
        .distinct()
      val top2 = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .orderBy(desc("df"), asc("tok")).limit(2)
        .select(col("tok"))
      tok.join(broadcast(top2), Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hit"))
        .filter(col("n_hit") === 2)
        .select(col("doc_id"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
              SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
              WHERE tok <> ''),
            top2 AS (
              SELECT tok FROM (SELECT tok, count(*) AS df FROM t GROUP BY tok)
              ORDER BY df DESC, tok LIMIT 2)
            SELECT doc_id FROM t JOIN top2 USING (tok)
            GROUP BY doc_id HAVING count(*) = 2
            ORDER BY doc_id""")
  )

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    * 2003 — the MOSS passage-duplication detector): word 3-gram hashes,
    * window w=4, each full window contributes its MINIMUM hash; a doc's
    * fingerprint set is its distinct selected hashes, and docs sharing ≥3
    * fingerprints are passage-duplicate candidates. Guarantees detection of
    * shared runs of ≥ w+k-1 = 7 words with O(1/w) fingerprint density —
    * substring-level dedup at set-of-longs cost, the layer between span
    * dedup (exact lines) and MinHash (whole-doc similarity).
    *
    * Scale shape: hashes are the engine-neutral md5 60-bit primitive; the
    * window min shares the per-doc exchange with the k-gram positions; the
    * pair join buckets on the fingerprint VALUE with the row_number cap of
    * every LSH path (a boilerplate fingerprint shared by half the corpus
    * stays a capped bucket, not a quadratic join), replayed in the oracle.
    */
  val winnowing = Q(
    "x_winnowing",
    (s, d) => {
      val k = 3; val w = 4
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), graft.functions.TextAnalysis.tokens(col("text")).as("ts"))
        .filter(size(col("ts")) >= k + w - 1)
      val grams = toks.select(col("doc_id"),
        posexplode(expr(s"transform(sequence(1, size(ts) - ${k - 1}), " +
          s"i -> conv(substring(md5(concat_ws(' ', slice(ts, i, $k))), 1, 15), 16, 10))"))
          .as(Seq("pos", "h")))
        .select(col("doc_id"), col("pos"), col("h").cast("long").as("h"))
      val nG = Window.partitionBy(col("doc_id"))
      val wMin = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.currentRow, w - 1)
      val fps = grams
        .withColumn("n", count(lit(1)).over(nG))
        .withColumn("wmin", min(col("h")).over(wMin))
        .filter(col("pos") <= col("n") - w) // full windows only (pos is 0-based)
        .select(col("doc_id"), col("wmin").as("fp"))
        .distinct()
      val capped = fps
        .withColumn("rn", row_number().over(Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
        .filter(col("rn") <= 50)
      val a = capped.select(col("fp"), col("doc_id").as("id_a"))
      val b = capped.select(col("fp"), col("doc_id").as("id_b"))
      a.join(b, "fp")
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH toks AS (
              SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
              FROM documents),
            grams AS (
              SELECT doc_id, i - 1 AS pos,
                list_reduce(list_transform(
                    string_split(substr(md5(array_to_string(ts[i:i+2], ' ')), 1, 15), ''),
                    c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                  (a, x) -> a * 16 + x) AS h
              FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)
              WHERE len(ts) >= 6),
            fps AS (
              SELECT DISTINCT doc_id, fp FROM (
                SELECT doc_id, pos,
                  count(*) OVER (PARTITION BY doc_id) AS n,
                  min(h) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
                FROM grams) z
              WHERE pos <= n - 4),
            cap AS (
              SELECT fp, doc_id FROM (
                SELECT fp, doc_id,
                  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM fps) z
              WHERE rn <= 50)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
            FROM cap a JOIN cap b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 3
            ORDER BY id_a, id_b""")
  )

  /** Count-min sketch (Cormode, Muthukrishnan, J. Algorithms 2005) over the
    * event-type stream: depth d=4 hash rows × width w=32 counters, per-key
    * point queries answered by the min over the key's d cells — the
    * fixed-128-cell mergeable frequency summary whose one-sided error
    * (estimate ≥ truth, overflow bounded by colliding mass) is checked here
    * EXACTLY: the sketch build, the point queries, and the per-key
    * overestimate all replay in SQL because the hash is the md5 primitive.
    * Scale: the sketch aggregation has 128 groups whatever the corpus size
    * (pure map-side combine), probes join the 128-row broadcast.
    */
  val countMin = Q(
    "x_countmin",
    (s, d) => {
      val depth = 4; val width = 32
      val ev = Tables.events(s, d).select(col("event_type"))
      // ONE scan: all d cell hashes ride a posexploded array per row (the
      // countMinStream shape) — a d-way union would rescan the corpus d
      // times (measured 27 s → half at gen10 for d=4).
      val cellArray = expr(
        s"""transform(sequence(0, ${depth - 1}),
            r -> cast(conv(substring(md5(concat('cm', r, ':', event_type)), 1, 15), 16, 10)
                 as long) % $width)""")
      val cells = ev.select(posexplode(cellArray).as(Seq("r", "b")))
        .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))
      val truth = ev.groupBy(col("event_type")).agg(count(lit(1)).as("true_count"))
      val probes = truth.select(col("event_type"), col("true_count"),
        posexplode(cellArray).as(Seq("r", "b")))
      probes.join(broadcast(cells), Seq("r", "b"))
        .groupBy(col("event_type"), col("true_count"))
        .agg(min(col("c")).as("cm_estimate"))
        .select(col("event_type"), col("true_count"), col("cm_estimate"),
          (col("cm_estimate") - col("true_count")).as("overestimate"))
        .orderBy("event_type")
    },
    Some("""WITH ev AS (SELECT event_type FROM events),
            cells AS (
              SELECT r.r, CAST(list_reduce(list_transform(
                  string_split(substr(md5('cm' || r.r || ':' || event_type), 1, 15), ''),
                  c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                (a, x) -> a * 16 + x) % 32 AS BIGINT) AS b,
                count(*) AS c
              FROM ev, range(0, 4) r(r) GROUP BY 1, 2),
            truth AS (SELECT event_type, count(*) AS true_count FROM ev GROUP BY 1),
            probes AS (
              SELECT event_type, true_count, r.r,
                CAST(list_reduce(list_transform(
                    string_split(substr(md5('cm' || r.r || ':' || event_type), 1, 15), ''),
                    c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                  (a, x) -> a * 16 + x) % 32 AS BIGINT) AS b
              FROM truth, range(0, 4) r(r))
            SELECT p.event_type, p.true_count,
              CAST(min(c.c) AS BIGINT) AS cm_estimate,
              CAST(min(c.c) - p.true_count AS BIGINT) AS overestimate
            FROM probes p JOIN cells c ON p.r = c.r AND p.b = c.b
            GROUP BY 1, 2 ORDER BY event_type""")
  )

  /** SCD Type 2 dimension build from a change stream: each user's event-type
    * transitions become validity intervals — `valid_from` the change time,
    * `valid_to` the NEXT change time (null while current), consecutive
    * repeats collapsed first (a re-statement of the same value is not a new
    * version — the lag filter). The lakehouse dimension-maintenance
    * complement to [[Extensions.cdcApply]]'s latest-wins flattening: one
    * user_id exchange carries the repeat-collapse lag, the interval lead,
    * and the grouping; at 100 TB this merges into a bucketed dimension
    * table keyed by user the way the CDC family's delta reshuffle does.
    * Folded to user_id % 97 so the registry row stays result-bounded at any
    * scale factor while exercising the identical plan.
    */
  val scd2 = Q(
    "x_scd2",
    (s, d) =>
      scd2Frame(s, d)
        .select(col("uid"), col("event_type"), col("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy("uid", "valid_from"),
    Some(s"""WITH $scd2OracleCtes
            SELECT uid, event_type, valid_from, valid_to,
              (valid_to IS NULL) AS is_current
            FROM v ORDER BY uid, valid_from""")
  )

  /** Zone-map pruning audit: lineitem binned into 64-row-group "files" in
    * orderkey layout, per-file min/max of the ship date (the stats every
    * parquet footer carries), then the fraction of files a 30-day predicate
    * can skip without reading — the data-layout observability face of
    * [[Extensions.zorderQ]] (which REORDERS; this MEASURES what the current
    * order buys). One aggregation over the fact table computes the zone
    * maps; the pruning decision is arithmetic over the tiny file-stats
    * frame. At 100 TB the file-stats frame IS the manifest/footer listing —
    * this plan never rescans data to decide pruning.
    */
  val zoneMap = Q(
    "x_zonemap",
    (s, d) => {
      val lo = lit("2024-03-01").cast("timestamp_ntz")
      val hi = lit("2024-03-31").cast("timestamp_ntz")
      val files = Tables.lineitem(s, d)
        .select((col("l_orderkey") / 64).cast("long").as("file_id"),
          col("l_shipdate").cast("timestamp_ntz").as("sd"))
        .groupBy(col("file_id"))
        .agg(min(col("sd")).as("mn"), max(col("sd")).as("mx"), count(lit(1)).as("rows"))
      files
        .agg(
          count(lit(1)).as("n_files"),
          sum(when(col("mx") < lo || col("mn") >= hi, 1L).otherwise(0L)).as("files_pruned"),
          sum(col("rows")).as("rows_total"),
          sum(when(col("mx") < lo || col("mn") >= hi, col("rows")).otherwise(lit(0L)))
            .as("rows_skipped"))
        .select(col("n_files"), col("files_pruned"), col("rows_total"), col("rows_skipped"))
    },
    Some("""WITH f AS (
              SELECT l_orderkey // 64 AS file_id,
                min(l_shipdate) AS mn, max(l_shipdate) AS mx, count(*) AS n
              FROM lineitem GROUP BY 1)
            SELECT count(*) AS n_files,
              CAST(COALESCE(sum(CASE WHEN mx < TIMESTAMP '2024-03-01'
                     OR mn >= TIMESTAMP '2024-03-31' THEN 1 ELSE 0 END), 0) AS BIGINT)
                AS files_pruned,
              CAST(sum(n) AS BIGINT) AS rows_total,
              CAST(COALESCE(sum(CASE WHEN mx < TIMESTAMP '2024-03-01'
                     OR mn >= TIMESTAMP '2024-03-31' THEN n ELSE 0 END), 0) AS BIGINT)
                AS rows_skipped
            FROM f""")
  )

  /** Linear multi-touch attribution: each purchase's revenue split EQUALLY
    * across the user's touches (view/click) in the preceding 7 days, summed
    * per channel — the fractional-credit complement to
    * [[Headline.h24 last-touch]]. Integer-exact: revenue fixes to cents via
    * DECIMAL(18,2), each touch's share is floor(cents·10⁶ / n_touches)
    * micro-cents, so the split replays bit-for-bit in SQL. The
    * purchase-touch window join is DAY-BUCKETIZED (the h21 interval-join
    * technique): each purchase explodes to its 8 candidate touch days and
    * joins on (user, day), so a power user's cost is per-(user, day) —
    * bounded by the window length — instead of an unbounded per-user
    * purchases×touches cross product; the exact time filter then trims the
    * bucket edges. The per-purchase touch count is a window over the join
    * output (no second join); the final channel rollup is a 2-group
    * aggregation. The oracle replays the SEMANTICS with the plain interval
    * predicate — identical rows, so the bucketization is provably
    * result-neutral every round.
    */
  val attributionLinear = Q(
    "x_attribution_linear",
    (s, d) => {
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("pid"),
          col("ts").as("pts"),
          (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
            .cast("long").as("cents"))
        .withColumn("tday",
          explode(sequence(date_sub(to_date(col("pts")), 7), to_date(col("pts")))))
      val t = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_type").as("channel"), col("ts").as("tts"),
          to_date(col("ts")).as("tday"))
      val j = p.join(t, Seq("user_id", "tday"))
        .filter(col("tts") < col("pts") &&
          col("tts") >= col("pts") - expr("INTERVAL 7 DAYS"))
      val wp = Window.partitionBy(col("pid"))
      j.withColumn("n_touches", count(lit(1)).over(wp))
        .withColumn("credit", expr("cents * 1000000 div n_touches"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touch_credits"),
          sum(col("credit")).as("credit_microcents"))
        .orderBy("channel")
    },
    Some("""WITH ev AS (SELECT user_id, event_id, event_type,
                CAST(ts AS TIMESTAMP) AS ts, value FROM events),
            p AS (
              SELECT user_id, event_id AS pid, ts AS pts,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
              FROM ev WHERE event_type = 'purchase'),
            t AS (
              SELECT user_id, event_type AS channel, ts AS tts
              FROM ev WHERE event_type IN ('view', 'click')),
            j AS (
              SELECT p.pid, p.cents, t.channel
              FROM p JOIN t ON p.user_id = t.user_id
                AND t.tts < p.pts AND t.tts >= p.pts - INTERVAL 7 DAY),
            c AS (
              SELECT channel, cents,
                count(*) OVER (PARTITION BY pid) AS n_touches
              FROM j)
            SELECT channel, count(*) AS n_touch_credits,
              CAST(sum(cents * 1000000 // n_touches) AS BIGINT) AS credit_microcents
            FROM c GROUP BY channel ORDER BY channel""")
  )

  /** The SCD2 interval frame of [[scd2]], shared with the point-in-time
    * lookup ([[scd2Lookup]]) — one definition, two registry faces.
    * Simultaneous changes (same uid, same ts) collapse to the lowest
    * event_id FIRST, so every version's valid_from is unique per key —
    * without that, an as-of probe landing exactly on a tied timestamp
    * would be ambiguous (engine-dependent which version wins).
    */
  private def scd2Frame(s: org.apache.spark.sql.SparkSession, d: String) = {
    // The same-ts collapse is a lag(ts) filter over the SAME (uid)
    // partitioning as the version windows — a (uid, ts)-partitioned
    // row_number would cost a second exchange; lag keeps the whole build on
    // one (PlanSpec-pinned).
    val wu = Window.partitionBy(col("uid")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .filter(col("user_id") % 97 === 0)
      .select((col("user_id") / lit(97)).cast("long").as("uid"),
        col("event_id"), col("ts"), col("event_type"))
      .withColumn("pts", lag(col("ts"), 1).over(wu))
      .filter(col("pts").isNull || col("pts") =!= col("ts"))
      .withColumn("prev", lag(col("event_type"), 1).over(wu))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(wu))
  }

  /** The `ch`/`dim`/`v` CTE chain replaying [[scd2Frame]] in DuckDB, shared
    * by both SCD2 oracles (a def: referenced by queries declared earlier in
    * the object, so a val would still be null at their init).
    */
  private def scd2OracleCtes: String =
    """ev1 AS (
              SELECT user_id // 97 AS uid, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
                lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS pts
              FROM events WHERE user_id % 97 = 0),
            ch AS (
              SELECT uid, event_id, ts, event_type,
                lag(event_type) OVER (PARTITION BY uid ORDER BY ts, event_id) AS prev
              FROM ev1 WHERE pts IS NULL OR pts <> ts),
            v AS (
              SELECT uid, event_type, ts AS valid_from,
                lead(ts) OVER (PARTITION BY uid ORDER BY ts, event_id) AS valid_to
              FROM ch WHERE prev IS NULL OR prev <> event_type)"""

  /** Point-in-time dimension lookup against the SCD2 table: for each probe
    * (a purchase event), the dimension version VALID AT the event time.
    * Because SCD2 intervals partition each key's timeline, "the version
    * with valid_from ≤ ts < valid_to" IS a backward as-of join on
    * valid_from — so this rides the repo's native single-pass sort-merge
    * [[graft.plans.AsOfJoinExec]] (O(1) state per key, zero exchanges on
    * bucketed layouts) instead of an interval join that would materialize
    * every (probe, version) pair before filtering. The temporal-audit shape
    * every lakehouse dimension serves: "what did we believe about the key
    * when the fact happened".
    */
  val scd2Lookup = Q(
    "x_scd2_lookup",
    (s, d) => {
      val dim = scd2Frame(s, d)
        .select(col("uid").as("duid"),
          col("valid_from").cast("timestamp_ntz").as("valid_from"),
          col("event_type").as("dim_state"))
      val probes = Tables.events(s, d)
        .filter(col("user_id") % 97 === 0 && col("event_type") === "purchase")
        .select(col("event_id"), (col("user_id") / lit(97)).cast("long").as("uid"),
          col("ts").cast("timestamp_ntz").as("ts"))
      graft.operators.AsOfJoin.native(probes, "uid", "ts", dim, "duid", "valid_from")
        .select(col("event_id"), col("uid"), col("ts"), col("dim_state"), col("valid_from"))
        .orderBy("event_id")
    },
    Some(s"""WITH $scd2OracleCtes,
            dim AS (
              SELECT uid, valid_from, event_type AS dim_state FROM v),
            probes AS (
              SELECT event_id, user_id // 97 AS uid, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE user_id % 97 = 0 AND event_type = 'purchase')
            SELECT p.event_id, p.uid, p.ts, d.dim_state, d.valid_from
            FROM probes p ASOF LEFT JOIN dim d
              ON p.uid = d.uid AND p.ts >= d.valid_from
            ORDER BY p.event_id""")
  )

  /** Triangle counting with DEGREE orientation (Chiba–Nishizeki; Schank's
    * forward algorithm): orient every undirected edge from its lower to its
    * higher endpoint under the (degree, id) total order, then each triangle
    * is counted exactly once as two out-edges of its minimum vertex closed
    * by a third oriented edge. Orientation is what survives skew at scale —
    * out-degrees are bounded by O(√m) on any graph (a hub's edges point
    * INTO it, so the wedge join's fan-out never explodes on the hub),
    * versus the id-ordered variant whose low-id hub keeps its whole
    * neighborhood. Also emits wedge count and the global clustering
    * coefficient in ppm (integer floor division — bit-exact). Same folded
    * event graph as [[Extensions.pagerankQ]].
    */
  val triangleCount = Q(
    "x_triangle_count",
    (s, d) => {
      val raw = Tables.events(s, d)
        .select((col("user_id") % 211).as("a"), (col("event_id") % 211).as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
        .distinct()
      val deg = raw.select(explode(array(col("lo"), col("hi"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      // (deg, id) total order packed into one sortable long: node < 2^20,
      // deg < 2^40 at any conceivable fold size.
      val ord = deg.select(col("node"), (col("deg") * 1048576 + col("node")).as("ok"))
      val o = raw
        .join(ord.select(col("node").as("lo"), col("ok").as("ok_lo")), "lo")
        .join(ord.select(col("node").as("hi"), col("ok").as("ok_hi")), "hi")
        .select(
          when(col("ok_lo") < col("ok_hi"), col("lo")).otherwise(col("hi")).as("src"),
          when(col("ok_lo") < col("ok_hi"), col("hi")).otherwise(col("lo")).as("dst"),
          when(col("ok_lo") < col("ok_hi"), col("ok_hi")).otherwise(col("ok_lo")).as("ok_dst"))
      val wedges = o.select(col("src"), col("dst").as("v"), col("ok_dst").as("ok_v"))
        .join(o.select(col("src"), col("dst").as("w"), col("ok_dst").as("ok_w")), "src")
        .filter(col("ok_v") < col("ok_w"))
      val tri = wedges
        .join(o.select(col("dst").as("w"), col("src").as("v")), Seq("v", "w"), "left_semi")
        .agg(count(lit(1)).as("n_triangles"))
      val wedgeTotal = deg
        .agg(sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
      tri.crossJoin(wedgeTotal)
        .select(col("n_triangles"), col("n_wedges"),
          expr("3 * n_triangles * 1000000 div n_wedges").as("clustering_ppm"))
    },
    Some("""WITH raw AS (
              SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi FROM (
                SELECT user_id % 211 AS a, event_id % 211 AS b FROM events)
              WHERE a <> b),
            deg AS (
              SELECT node, count(*) AS deg FROM (
                SELECT lo AS node FROM raw UNION ALL SELECT hi FROM raw)
              GROUP BY node),
            ord AS (SELECT node, deg * 1048576 + node AS ok FROM deg),
            o AS (
              SELECT CASE WHEN dl.ok < dh.ok THEN r.lo ELSE r.hi END AS src,
                     CASE WHEN dl.ok < dh.ok THEN r.hi ELSE r.lo END AS dst,
                     CASE WHEN dl.ok < dh.ok THEN dh.ok ELSE dl.ok END AS ok_dst
              FROM raw r JOIN ord dl ON r.lo = dl.node JOIN ord dh ON r.hi = dh.node),
            w AS (
              SELECT o1.src, o1.dst AS v, o1.ok_dst AS ok_v, o2.dst AS w, o2.ok_dst AS ok_w
              FROM o o1 JOIN o o2 ON o1.src = o2.src
              WHERE o1.ok_dst < o2.ok_dst),
            tri AS (
              SELECT count(*) AS n_triangles
              FROM w WHERE EXISTS (
                SELECT 1 FROM o WHERE o.src = w.v AND o.dst = w.w)),
            wt AS (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
            SELECT tri.n_triangles, wt.n_wedges,
              CAST(3 * tri.n_triangles * 1000000 // wt.n_wedges AS BIGINT) AS clustering_ppm
            FROM tri, wt""")
  )

  /** Referential-integrity audit — the lakehouse constraint check engines
    * run after every load (DLT expectations / Great-Expectations shape):
    * child→parent orphan counts and rates for the schema's two FK edges.
    * Each relation is one anti-join keyed on the FK (dims too big to
    * broadcast shuffle once; Spark's runtime bloom filter prunes the child
    * scan first); rates in ppm by integer division.
    */
  val fkAudit = Q(
    "x_fk_audit",
    (s, d) => {
      def audit(rel: String, child: org.apache.spark.sql.DataFrame, fk: String,
                parent: org.apache.spark.sql.DataFrame, pk: String) = {
        val orphans = child.select(col(fk))
          .join(parent.select(col(pk).as(fk)), Seq(fk), "left_anti")
        child.agg(count(lit(1)).as("n_child")).crossJoin(
          orphans.agg(count(lit(1)).as("n_orphans")))
          .select(lit(rel).as("relation"), col("n_child"), col("n_orphans"),
            expr("n_orphans * 1000000 div n_child").as("orphan_ppm"))
      }
      audit("lineitem->orders", Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d), "o_orderkey")
        .union(audit("orders->customer", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"))
        .orderBy("relation")
    },
    Some("""WITH li AS (
              SELECT 'lineitem->orders' AS relation,
                (SELECT count(*) FROM lineitem) AS n_child,
                (SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
                  AS n_orphans),
            oc AS (
              SELECT 'orders->customer' AS relation,
                (SELECT count(*) FROM orders) AS n_child,
                (SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
                  AS n_orphans)
            SELECT relation, n_child, n_orphans,
              CAST(n_orphans * 1000000 // n_child AS BIGINT) AS orphan_ppm
            FROM (SELECT * FROM li UNION ALL SELECT * FROM oc)
            ORDER BY relation""")
  )

  /** Time-series resampling with forward fill (the pandas
    * `resample('1D').ffill()` staple, distributed): each user's event value
    * lands on a daily grid over their own [first, last] event span, each
    * grid day carrying the value as of END of day. The grid is a per-key
    * `sequence` explode (no calendar table scan), the fill is a backward
    * as-of join on the native exec — per-key merge, O(1) state, no
    * per-day×per-event blowup — and same-instant events pre-collapse by
    * max event_id (`max_by`) so the as-of is unambiguous cross-engine.
    * Values fix to cents so the fill replays bit-exact.
    */
  val resampleFfill = Q(
    "x_resample_ffill",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("user_id") % 7 === 0)
        .select(col("user_id").as("euid"), col("ts").cast("timestamp_ntz").as("ts"),
          col("event_id"),
          (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
            .cast("long").as("cents"))
        .groupBy(col("euid"), col("ts"))
        .agg(max_by(col("cents"), col("event_id")).as("cents"))
      val grid = ev.groupBy(col("euid").as("uid"))
        .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
        .select(col("uid"), explode(sequence(col("d0"), col("d1"))).as("day"))
        .withColumn("grid_ts",
          expr("timestampadd(MICROSECOND, -1, timestampadd(DAY, 1, cast(day as timestamp)))")
            .cast("timestamp_ntz"))
      graft.operators.AsOfJoin.native(grid, "uid", "grid_ts", ev, "euid", "ts")
        .select(col("uid"), col("day"), col("cents").as("cents_ffill"))
        .orderBy("uid", "day")
    },
    Some("""WITH ev AS (
              SELECT user_id AS euid, CAST(ts AS TIMESTAMP) AS ts,
                arg_max(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), event_id) AS cents
              FROM events WHERE user_id % 7 = 0
              GROUP BY 1, 2),
            span AS (
              SELECT euid AS uid, min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
              FROM ev GROUP BY 1),
            grid AS (
              SELECT uid, CAST(g AS DATE) AS day,
                CAST(g AS TIMESTAMP) + INTERVAL 1 DAY - INTERVAL 1 MICROSECOND AS grid_ts
              FROM span, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS t(g))
            SELECT g.uid, g.day, e.cents AS cents_ffill
            FROM grid g ASOF LEFT JOIN ev e
              ON g.uid = e.euid AND g.grid_ts >= e.ts
            ORDER BY g.uid, g.day""")
  )

  /** Sorted-neighborhood record linkage (Hernández & Stolfo, SIGMOD 1995):
    * records sorted by the blocking key, each compared against its next
    * w-1=4 neighbors in the sorted run, candidate quality summarized as an
    * edit-distance histogram — the classic alternative to FastSS blocking
    * ([[Extensions.fuzzyJoinEdit]]) when the key space sorts duplicates
    * near each other.
    *
    * The sorted run is PARTITIONED by a key prefix (sorted-run blocking):
    * an unpartitioned `Window.orderBy` funnels the whole table through one
    * task — the corpus-sized-window anti-pattern (measured: 18.9 s at 1.5 M
    * rows single-partition vs bounded blocks), so the lead windows run
    * per prefix block instead, each bounded by the prefix's fan-out
    * (10⁴ here: the 9-digit key keeps its last 4 digits inside a block).
    * The w-1 pairs straddling each block boundary are the method's known
    * window-boundary caveat (a production run adds an overlap pass);
    * deterministic on both engines, so the histogram replays exactly.
    */
  val sortedNeighborhood = Q(
    "x_sorted_neighborhood",
    (s, d) => {
      val w = Window.partitionBy(col("blk")).orderBy(col("name"), col("id"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
          expr("substring(c_name, 1, length(c_name) - 4)").as("blk"))
      val leads = (1 to 4).map(i =>
        struct(lead(col("id"), i).over(w).as("id_b"),
          lead(col("name"), i).over(w).as("name_b")).as(s"l$i"))
      c.select((col("id") +: col("name") +: leads): _*)
        .select(col("id"), col("name"),
          explode(array((1 to 4).map(i => col(s"l$i")): _*)).as("nb"))
        .filter(col("nb.id_b").isNotNull)
        .select(levenshtein(col("name"), col("nb.name_b")).cast("long").as("dist"))
        .groupBy(col("dist")).agg(count(lit(1)).as("n_pairs"))
        .orderBy("dist")
    },
    Some("""WITH c AS (
              SELECT c_custkey AS id, c_name AS name,
                substring(c_name, 1, length(c_name) - 4) AS blk
              FROM customer),
            ld AS (
              SELECT id, name,
                lead(name, 1) OVER (PARTITION BY blk ORDER BY name, id) AS n1,
                lead(name, 2) OVER (PARTITION BY blk ORDER BY name, id) AS n2,
                lead(name, 3) OVER (PARTITION BY blk ORDER BY name, id) AS n3,
                lead(name, 4) OVER (PARTITION BY blk ORDER BY name, id) AS n4
              FROM c),
            pairs AS (
              SELECT name, unnest([n1, n2, n3, n4]) AS name_b FROM ld)
            SELECT CAST(levenshtein(name, name_b) AS BIGINT) AS dist,
              count(*) AS n_pairs
            FROM pairs WHERE name_b IS NOT NULL
            GROUP BY 1 ORDER BY dist""")
  )

  /** Label-propagation community detection (Raghavan et al., Phys. Rev. E
    * 2007), made deterministic and ORACLE-REPLAYABLE: synchronous rounds,
    * each node adopting its neighbors' most frequent label with the
    * (count DESC, label ASC) total order — no RNG, no visit-order
    * dependence — three rounds unrolled (the x_pagerank precedent: an
    * iterative model is oracle-able when every step is a deterministic
    * aggregation). Distinct from connected components (min-label
    * convergence): frequency voting finds dense SUBcommunities inside one
    * component. Per round: one edge-label join + one (node, label) count +
    * one per-node argmax window — all on the node/edge frames, never
    * corpus-sized.
    */
  val labelPropagation = Q(
    "x_label_propagation",
    (s, d) => {
      val e0 = Tables.events(s, d)
        .select((col("user_id") % 211).as("a"), (col("event_id") % 211).as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
        .distinct()
      val edges = e0.select(col("lo").as("src"), col("hi").as("dst"))
        .union(e0.select(col("hi").as("src"), col("lo").as("dst")))
        .truncateLineage() // 3 rounds rescan this frame; truncate once
      var labels = edges.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label"))
      val wv = Window.partitionBy(col("node")).orderBy(desc("cnt"), asc("label"))
      for (_ <- 1 to 3) {
        labels = edges
          .join(labels.select(col("node").as("dst"), col("label")), "dst")
          .groupBy(col("src").as("node"), col("label"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(wv))
          .filter(col("rn") === 1)
          .select(col("node"), col("label"))
      }
      labels.orderBy("node")
    },
    Some {
      val rounds = (1 to 3).map { r =>
        s"""v$r AS (
           |  SELECT node, label FROM (
           |    SELECT e.src AS node, l.label, count(*) AS cnt,
           |      row_number() OVER (PARTITION BY e.src ORDER BY count(*) DESC, l.label) AS rn
           |    FROM edges e JOIN l${r - 1} l ON e.dst = l.node
           |    GROUP BY e.src, l.label) z
           |  WHERE rn = 1),
           |l$r AS (SELECT node, label FROM v$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (
            SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi FROM (
              SELECT user_id % 211 AS a, event_id % 211 AS b FROM events)
            WHERE a <> b),
          edges AS (
            SELECT lo AS src, hi AS dst FROM e0
            UNION ALL SELECT hi, lo FROM e0),
          l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
          $rounds
          SELECT node, label FROM l3 ORDER BY node"""
    }
  )

  /** Bloom-filter file-index audit — the second data-skipping structure
    * beside [[zoneMap]] (zone maps skip by RANGE, blooms skip by POINT
    * lookup on unclustered columns): per 64-orderkey "file", a 4096-bit
    * k=3 bloom of its part keys (bits stored as (file, bit) rows — the
    * roaring-style sparse form, one aggregation); probes are the 5 most
    * frequent part keys (data-driven) plus 5 known-absent keys, each
    * answered with maybe-files (all k bits set), actual-files, and the
    * false-positive gap — the skip-rate evidence a table format's footer
    * stats would carry. All hashes are the md5 primitive, so build and
    * probes replay row-level.
    *
    * Hash cost model (the r12 slow-list fix): bits depend only on the KEY,
    * so the digest runs once per DISTINCT part key (|keys| md5s, ~20k at
    * sf0.1) and broadcast-joins back onto the (file, key) pairs — not once
    * per row×k (1.8M md5s, the original shape). The k=3 bit positions split
    * ONE digest (hex chars 1–3 / 4–6 / 7–9; 3 hex chars are exactly the
    * 12-bit space, no modulo) — the Kirsch–Mitzenmacher "less hashing, same
    * performance" construction. At 100 TB the build cost is dominated by the
    * (file, bit) distinct aggregation, which is the honest index cost; the
    * hashing is now key-cardinality-bounded, not corpus-bounded.
    */
  val bloomIndex = Q(
    "x_bloom_index",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select((col("l_orderkey") / 64).cast("long").as("file_id"), col("l_partkey"))
      val keyBits = li.select(col("l_partkey")).distinct()
        .withColumn("dig", expr("md5(concat('bf:', l_partkey))"))
        .select(col("l_partkey"), posexplode(expr(
          """transform(sequence(0, 2),
             r -> cast(conv(substring(dig, 1 + r * 3, 3), 16, 10) as long))"""))
          .as(Seq("r", "bit")))
      // (file, key) pre-dedup before the ×3 bit explode: measured A/B at
      // sf0.1 (clean windows) it beats joining straight off the scan — the
      // deduped, AQE-coalesced frame feeds the explode and the (file, bit)
      // distinct a third of the rows their partial aggregates otherwise eat.
      val fileBits = li.distinct()
        .join(broadcast(keyBits.select(col("l_partkey"), col("bit"))), Seq("l_partkey"))
        .select(col("file_id"), col("bit"))
        .distinct()
      // Key-frequency frame is key-cardinality-sized; checkpoint it so the
      // four probe-side derivations (top5, absent5, probe bits, actual)
      // don't each re-scan lineitem through its lineage.
      val present = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n")).truncateLineage()
      val top5 = present.orderBy(desc("n"), asc("l_partkey")).limit(5).select(col("l_partkey"))
      val absent5 = present.agg(max(col("l_partkey")).as("mx"))
        .select(explode(sequence(col("mx") + 1, col("mx") + 5)).as("l_partkey"))
      val probes = top5.union(absent5)
        .withColumn("dig", expr("md5(concat('bf:', l_partkey))"))
        .select(col("l_partkey").as("probe_key"), posexplode(expr(
          """transform(sequence(0, 2),
             r -> cast(conv(substring(dig, 1 + r * 3, 3), 16, 10) as long))"""))
          .as(Seq("r", "bit")))
      val maybe = fileBits.join(broadcast(probes), Seq("bit"))
        .groupBy(col("probe_key"), col("file_id"))
        .agg(countDistinct(col("r")).as("hits"))
        .filter(col("hits") === 3)
        .groupBy(col("probe_key")).agg(count(lit(1)).as("n_files_maybe"))
      val actual = li.join(broadcast(top5.union(absent5)
          .select(col("l_partkey").as("probe_key"))),
          col("l_partkey") === col("probe_key"))
        .groupBy(col("probe_key"))
        .agg(countDistinct(col("file_id")).as("n_files_actual"))
      maybe
        .join(actual, Seq("probe_key"), "left")
        .select(col("probe_key"),
          col("n_files_maybe"),
          coalesce(col("n_files_actual"), lit(0L)).as("n_files_actual"),
          (col("n_files_maybe") - coalesce(col("n_files_actual"), lit(0L)))
            .as("n_false_positive"))
        .orderBy("probe_key")
    },
    Some("""WITH li AS (
              SELECT l_orderkey // 64 AS file_id, l_partkey FROM lineitem),
            kb AS (
              SELECT l_partkey,
                CAST(list_reduce(list_transform(
                    string_split(substr(md5('bf:' || l_partkey), 1 + r.r * 3, 3), ''),
                    c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                  (a, x) -> a * 16 + x) AS BIGINT) AS bit
              FROM (SELECT DISTINCT l_partkey FROM li), range(0, 3) r(r)),
            bits AS (
              SELECT DISTINCT fp.file_id, kb.bit
              FROM (SELECT DISTINCT file_id, l_partkey FROM li) fp
              JOIN kb USING (l_partkey)),
            pk AS (SELECT l_partkey, count(*) AS n FROM li GROUP BY 1),
            top5 AS (SELECT l_partkey FROM pk ORDER BY n DESC, l_partkey LIMIT 5),
            abs5 AS (
              SELECT unnest(generate_series(mx + 1, mx + 5)) AS l_partkey
              FROM (SELECT max(l_partkey) AS mx FROM pk)),
            probes AS (
              SELECT l_partkey AS probe_key, r.r,
                CAST(list_reduce(list_transform(
                    string_split(substr(md5('bf:' || l_partkey), 1 + r.r * 3, 3), ''),
                    c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                  (a, x) -> a * 16 + x) AS BIGINT) AS bit
              FROM (SELECT * FROM top5 UNION ALL SELECT * FROM abs5), range(0, 3) r(r)),
            maybe AS (
              SELECT probe_key, count(*) AS n_files_maybe FROM (
                SELECT p.probe_key, b.file_id
                FROM probes p JOIN bits b ON p.bit = b.bit
                GROUP BY 1, 2 HAVING count(DISTINCT p.r) = 3) z
              GROUP BY probe_key),
            act AS (
              SELECT l_partkey AS probe_key, count(DISTINCT file_id) AS n_files_actual
              FROM li WHERE l_partkey IN (SELECT l_partkey FROM top5)
              GROUP BY 1)
            SELECT m.probe_key, m.n_files_maybe,
              COALESCE(a.n_files_actual, 0) AS n_files_actual,
              CAST(m.n_files_maybe - COALESCE(a.n_files_actual, 0) AS BIGINT)
                AS n_false_positive
            FROM maybe m LEFT JOIN act a ON m.probe_key = a.probe_key
            ORDER BY m.probe_key""")
  )

  /** Retraction-aware incremental MV maintenance: the daily revenue MV kept
    * fresh under a CDC batch carrying INSERTS AND DELETES — each side folds
    * in as signed (±count, ±cents) partials and one re-aggregation on the
    * group key absorbs both (the algebraic-aggregate retraction rule:
    * sum/count are abelian, so a delete is just a negative partial). The
    * delete-aware completion of [[Extensions.mvIncremental]]: history is
    * never rescanned — per refresh the work is O(|MV| + |batch|) — and the
    * oracle IS the from-scratch recompute over (base ∖ deletes) ∪ inserts,
    * so the driver proves retraction == recompute every round. Days whose
    * rows were entirely retracted drop out via the HAVING n > 0 guard
    * (their partials cancel to zero, the empty-group analog).
    */
  val mvRetract = Q(
    "x_mv_retract",
    (s, d) => {
      val split = "2024-01-20"
      val ev = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"),
          (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
            .cast("long").as("cents"))
      val base    = ev.filter(col("ts") < to_timestamp(lit(split)))
      val inserts = ev.filter(col("ts") >= to_timestamp(lit(split)))
      val deletes = base.filter(col("event_id") % 7 === 0)
      def daily(df: org.apache.spark.sql.DataFrame, sign: Int) = df
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg((sum(col("cents")) * sign).as("cents"), (count(lit(1)) * sign).as("n"))
      daily(base, 1).union(daily(inserts, 1)).union(daily(deletes, -1))
        .groupBy(col("day"))
        .agg(sum(col("cents")).as("cents"), sum(col("n")).as("n"))
        .filter(col("n") > 0)
        .select(col("day"), col("cents").as("revenue_cents"), col("n"))
        .orderBy("day")
    },
    Some("""WITH ev AS (
              SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
              FROM events WHERE event_type = 'purchase'),
            kept AS (
              SELECT * FROM ev
              WHERE ts >= TIMESTAMP '2024-01-20'
                 OR (ts < TIMESTAMP '2024-01-20' AND event_id % 7 <> 0))
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
              CAST(sum(cents) AS BIGINT) AS revenue_cents,
              count(*) AS n
            FROM kept GROUP BY 1 ORDER BY day""")
  )

  /** Market-basket co-occurrence with lift (the association-rule first
    * stage): baskets are (user, day), items the `props.k % 20` fold; item
    * pairs counted within baskets and scored by lift in ppm — integer
    * floor division over support counts, bit-exact. The per-basket item
    * list is DISTINCT and bounded (row_number cap 50 — the LSH bucket
    * discipline) before pair expansion, so a degenerate basket cannot go
    * quadratic; pair counting shares one basket-key exchange and the
    * supports broadcast back onto the pair frame.
    */
  val marketBasket = Q(
    "x_market_basket",
    (s, d) => {
      val items = Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"),
          (get_json_object(col("props"), "$.k").cast("long") % 20).as("item"))
        .distinct()
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"), col("day")).orderBy(col("item"))))
        .filter(col("rn") <= 50)
      val nBaskets = items.select(col("user_id"), col("day")).distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val support = items.groupBy(col("item")).agg(count(lit(1)).as("sup"))
      val a = items.select(col("user_id"), col("day"), col("item").as("item_a"))
      val b = items.select(col("user_id"), col("day"), col("item").as("item_b"))
      val pairs = a.join(b, Seq("user_id", "day"))
        .filter(col("item_a") < col("item_b"))
        .groupBy(col("item_a"), col("item_b"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(support.select(col("item").as("item_a"), col("sup").as("sup_a"))), "item_a")
        .join(broadcast(support.select(col("item").as("item_b"), col("sup").as("sup_b"))), "item_b")
        .crossJoin(broadcast(nBaskets))
        .select(col("item_a"), col("item_b"), col("n_ab"),
          expr("n_ab * n_baskets * 1000000 div (sup_a * sup_b)").as("lift_ppm"))
        .orderBy(desc("lift_ppm"), asc("item_a"), asc("item_b"))
        .limit(20)
    },
    Some("""WITH it0 AS (
              SELECT DISTINCT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
                CAST(json_extract_string(props, '$.k') AS BIGINT) % 20 AS item
              FROM events),
            items AS (
              SELECT user_id, day, item FROM (
                SELECT user_id, day, item,
                  row_number() OVER (PARTITION BY user_id, day ORDER BY item) AS rn
                FROM it0) z
              WHERE rn <= 50),
            nb AS (SELECT count(*) AS n_baskets FROM (SELECT DISTINCT user_id, day FROM items)),
            sup AS (SELECT item, count(*) AS sup FROM items GROUP BY item),
            pairs AS (
              SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
              FROM items a JOIN items b
                ON a.user_id = b.user_id AND a.day = b.day AND a.item < b.item
              GROUP BY 1, 2)
            SELECT p.item_a, p.item_b, p.n_ab,
              CAST(p.n_ab * nb.n_baskets * 1000000 // (sa.sup * sb.sup) AS BIGINT) AS lift_ppm
            FROM pairs p
              JOIN sup sa ON p.item_a = sa.item
              JOIN sup sb ON p.item_b = sb.item
              CROSS JOIN nb
            ORDER BY lift_ppm DESC, item_a, item_b LIMIT 20""")
  )

  /** Query-by-document retrieval: the corpus's most similar docs to a probe
    * doc by sparse TF-IDF dot product THROUGH the inverted-index shape —
    * the fourth face of the search family (index build → boolean → BM25
    * ranked → similar-doc). The probe's weighted terms are a broadcast;
    * the corpus side touches only rows whose token appears in the probe
    * (posting intersection — never a all-pairs doc similarity), and each
    * (term, doc) weight quantizes to a 1e-6 BIGINT BEFORE the per-doc sum,
    * the bm25Search discipline: integer sums are order-independent, so
    * partial-agg order and last-ulp `ln` divergence cannot flip ranks or
    * hashes. Top-10 by (score, doc) total order via TakeOrderedAndProject.
    */
  val tfidfDocSim = Q(
    "x_tfidf_doc_sim",
    (s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(graft.functions.TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val n  = Tables.documents(s, d).agg(count(lit(1)).as("n"))
      val df = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val w = tok.join(df, "tok").crossJoin(broadcast(n))
        .select(col("doc_id"), col("tok"),
          floor(col("tf") * log(col("n").cast("double") / col("df").cast("double")) * 1e6)
            .cast("long").as("w"))
      val probe = w.filter(col("doc_id") === 0)
        .select(col("tok"), col("w").as("qw"))
      w.filter(col("doc_id") =!= 0)
        .join(broadcast(probe), "tok")
        .groupBy(col("doc_id"))
        .agg(sum(col("w") * col("qw")).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
        .limit(10)
    },
    Some("""WITH t AS (
              SELECT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
              WHERE tok <> ''),
            tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
            df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
            nn AS (SELECT count(*) AS n FROM documents),
            w AS (
              SELECT tf.doc_id, tf.tok,
                CAST(floor(tf.tf * ln(CAST(nn.n AS DOUBLE) / CAST(df.df AS DOUBLE)) * 1e6)
                     AS BIGINT) AS w
              FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN nn),
            probe AS (SELECT tok, w AS qw FROM w WHERE doc_id = 0)
            SELECT w.doc_id, CAST(sum(w.w * p.qw) AS BIGINT) AS score
            FROM w JOIN probe p ON w.tok = p.tok
            WHERE w.doc_id <> 0
            GROUP BY w.doc_id
            ORDER BY score DESC, doc_id LIMIT 10""")
  )

  /** Distribution drift between two time windows — the data-quality monitor
    * every production pipeline runs between yesterday's and today's feed:
    * per-category rate in ppm (integer floor division over exact counts —
    * no doubles anywhere), absolute per-category drift, and the total-
    * variation distance (half the L1) in ppm. Integer arithmetic end to
    * end, so the statistic is bit-identical however the counts aggregate;
    * categories missing from one window count at rate 0 via the full outer
    * join. Two scans of the fact table (one per window) that AQE folds
    * into one with the date filter pushed down; the drift math runs on the
    * category-cardinality frame.
    */
  val driftTv = Q(
    "x_drift_tv",
    (s, d) => {
      val split = to_timestamp(lit("2024-01-15"))
      val ev = Tables.events(s, d)
      def rates(f: org.apache.spark.sql.Column) = ev.filter(f)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(ev.filter(f).agg(count(lit(1)).as("tot"))))
        .select(col("event_type"), expr("n * 1000000 div tot").as("ppm"))
      rates(col("ts") < split).select(col("event_type"), col("ppm").as("ppm_before"))
        .join(rates(col("ts") >= split).select(col("event_type"), col("ppm").as("ppm_after")),
          Seq("event_type"), "full_outer")
        .select(col("event_type"),
          coalesce(col("ppm_before"), lit(0L)).as("ppm_before"),
          coalesce(col("ppm_after"), lit(0L)).as("ppm_after"))
        .withColumn("drift_ppm", abs(col("ppm_after") - col("ppm_before")))
        .orderBy("event_type")
    },
    Some("""WITH b AS (
              SELECT event_type, count(*) AS n FROM events
              WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15' GROUP BY 1),
            bt AS (SELECT sum(n) AS tot FROM b),
            a AS (
              SELECT event_type, count(*) AS n FROM events
              WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15' GROUP BY 1),
            at AS (SELECT sum(n) AS tot FROM a),
            rb AS (SELECT event_type, CAST(n * 1000000 // bt.tot AS BIGINT) AS ppm_before
                   FROM b, bt),
            ra AS (SELECT event_type, CAST(n * 1000000 // at.tot AS BIGINT) AS ppm_after
                   FROM a, at)
            SELECT COALESCE(rb.event_type, ra.event_type) AS event_type,
              COALESCE(rb.ppm_before, 0) AS ppm_before,
              COALESCE(ra.ppm_after, 0) AS ppm_after,
              abs(COALESCE(ra.ppm_after, 0) - COALESCE(rb.ppm_before, 0)) AS drift_ppm
            FROM rb FULL OUTER JOIN ra ON rb.event_type = ra.event_type
            ORDER BY event_type""")
  )

  /** MMR diversified re-ranking (Carbonell & Goldstein, SIGIR 1998) — the
    * serving-side stage BETWEEN ANN retrieval and the user: from the
    * query's top-12 nearest candidates, greedily select 4 minimizing
    * `7·d²(q,c) − 3·min_{s∈S} d²(c,s)` (relevance vs redundancy at
    * λ=0.7, distance form), integer-exact over the 1e-6-quantized vectors
    * so every greedy round replays in SQL — the x_kmeans/x_bpe unroll
    * precedent applied to a SEQUENTIAL SELECTION process. Scale shape:
    * the expensive part is the ANN top-12 (the existing family's cost
    * model); MMR itself touches only the candidate set — pairwise d² over
    * 12 rows, four argmin rounds — and is corpus-size-independent by
    * construction.
    */
  val mmrDiversify = Q(
    "x_mmr_diversify",
    (s, d) => {
      import graft.functions.NativeFns
      def qv(c: org.apache.spark.sql.Column) =
        transform(c, x => floor(x.cast("double") * lit(1e6)))
      val e = Tables.embeddings(s, d).select(col("vec_id"), qv(col("embedding")).as("qv"))
      val q = e.filter(col("vec_id") === 0).select(col("qv").as("qqv"))
      val cands = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("qv"), NativeFns.l2_dist2(col("qv"), col("qqv")).as("dq"))
        .orderBy(col("dq"), col("vec_id")).limit(12)
        .truncateLineage() // tiny frame scanned by all four rounds
      val pairs = cands.select(col("vec_id").as("c1"), col("qv").as("v1"))
        .join(cands.select(col("vec_id").as("c2"), col("qv").as("v2")), col("c1") =!= col("c2"))
        .select(col("c1"), col("c2"), NativeFns.l2_dist2(col("v1"), col("v2")).as("pd2"))
        .truncateLineage()
      var out = cands
        .select(col("vec_id"), (lit(7L) * col("dq")).as("score"))
        .orderBy(col("score"), col("vec_id")).limit(1)
        .withColumn("sel_round", lit(1L))
      var sel = out.select(col("vec_id"))
      for (r <- 2 to 4) {
        val pen = pairs.join(sel.select(col("vec_id").as("c2")), "c2")
          .groupBy(col("c1").as("vec_id")).agg(min(col("pd2")).as("pen"))
        val pick = cands.join(sel, Seq("vec_id"), "left_anti")
          .join(pen, Seq("vec_id"))
          .select(col("vec_id"), (lit(7L) * col("dq") - lit(3L) * col("pen")).as("score"))
          .orderBy(col("score"), col("vec_id")).limit(1)
          .withColumn("sel_round", lit(r.toLong))
        out = out.unionByName(pick)
        sel = sel.unionByName(pick.select(col("vec_id")))
      }
      out.select(col("sel_round"), col("vec_id"), col("score")).orderBy("sel_round")
    },
    Some {
      val rounds = (2 to 4).map { r =>
        s"""p$r AS (
           |  SELECT c.vec_id, CAST(7 * c.dq - 3 * min(p.pd2) AS BIGINT) AS score
           |  FROM cands c
           |    JOIN pr p ON p.c1 = c.vec_id
           |    JOIN sel${r - 1} s ON p.c2 = s.vec_id
           |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
           |  GROUP BY c.vec_id, c.dq
           |  ORDER BY score, c.vec_id LIMIT 1),
           |sel$r AS (SELECT vec_id FROM sel${r - 1} UNION ALL SELECT vec_id FROM p$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
            SELECT vec_id, list_transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
            FROM embeddings),
          qq AS (SELECT qv AS qqv FROM e WHERE vec_id = 0),
          cands AS (
            SELECT e.vec_id, e.qv,
              CAST(list_sum(list_transform(range(1, len(e.qv) + 1),
                i -> (e.qv[i] - q.qqv[i]) * (e.qv[i] - q.qqv[i]))) AS BIGINT) AS dq
            FROM e, qq q WHERE e.vec_id <> 0
            ORDER BY dq, vec_id LIMIT 12),
          pr AS (
            SELECT a.vec_id AS c1, b.vec_id AS c2,
              CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
                i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i]))) AS BIGINT) AS pd2
            FROM cands a JOIN cands b ON a.vec_id <> b.vec_id),
          p1 AS (
            SELECT vec_id, CAST(7 * dq AS BIGINT) AS score
            FROM cands ORDER BY score, vec_id LIMIT 1),
          sel1 AS (SELECT vec_id FROM p1),
          $rounds
          SELECT * FROM (
            SELECT CAST(1 AS BIGINT) AS sel_round, vec_id, score FROM p1
            UNION ALL SELECT 2, vec_id, score FROM p2
            UNION ALL SELECT 3, vec_id, score FROM p3
            UNION ALL SELECT 4, vec_id, score FROM p4)
          ORDER BY sel_round"""
    }
  )

  /** Cohort lifetime-value curves — the companion to h23's retention: users
    * cohorted by first-seen day, purchase revenue accumulated by cohort age
    * (days since first seen), each (cohort, age) cell carrying the running
    * total — the "how much has the Jan-3 cohort spent by day N" curve.
    * Integer cents end to end; the cumulative window partitions by cohort
    * day (bounded frames), and the user→cohort assignment shares the one
    * user_id exchange with the first-seen min — the funnel-family shuffle
    * discipline.
    */
  val userLtv = Q(
    "x_user_ltv",
    (s, d) => {
      val ev = Tables.events(s, d)
      val firstSeen = ev.groupBy(col("user_id"))
        .agg(min(date_trunc("day", col("ts")).cast("date")).as("cohort_day"))
      val spend = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"),
          (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
            .cast("long").as("cents"))
      val wc = Window.partitionBy(col("cohort_day")).orderBy(col("age_days"))
      spend.join(firstSeen, "user_id")
        .select(col("cohort_day"), datediff(col("day"), col("cohort_day")).cast("long").as("age_days"),
          col("cents"))
        .groupBy(col("cohort_day"), col("age_days"))
        .agg(sum(col("cents")).as("day_cents"))
        .withColumn("cum_cents", sum(col("day_cents")).over(wc))
        .select(col("cohort_day"), col("age_days"), col("day_cents"), col("cum_cents"))
        .orderBy("cohort_day", "age_days")
    },
    Some("""WITH fs AS (
              SELECT user_id, min(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS cohort_day
              FROM events GROUP BY 1),
            sp AS (
              SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
              FROM events WHERE event_type = 'purchase'),
            cell AS (
              SELECT fs.cohort_day, date_diff('day', fs.cohort_day, sp.day) AS age_days,
                CAST(sum(sp.cents) AS BIGINT) AS day_cents
              FROM sp JOIN fs ON sp.user_id = fs.user_id
              GROUP BY 1, 2)
            SELECT cohort_day, CAST(age_days AS BIGINT) AS age_days, day_cents,
              CAST(sum(day_cents) OVER (PARTITION BY cohort_day ORDER BY age_days) AS BIGINT)
                AS cum_cents
            FROM cell ORDER BY cohort_day, age_days""")
  )

  /** RFM segmentation (recency / frequency / monetary quintiles) — the
    * classic customer-scoring operator: per user the days since last
    * purchase, purchase count, and cents total, each scored 1-5 by ntile
    * over the AGGREGATED user frame. The user frame is corpus-scale on a
    * real event store (10⁸⁺ purchasers), so each quintile is computed as
    * [[graft.functions.Layout.twoPhaseRank]] (range-partition → per-slice
    * row_number → broadcast per-slice offsets; the only unpartitioned
    * windows left are the ≤`shuffle.partitions`-row offset frames) with
    * [[graft.functions.Layout.ntileFromRank]] recovering the exact SQL
    * ntile bucket — bit-identical to `ntile(5) OVER (ORDER BY …)`
    * including the first-`n mod 5`-buckets-get-the-extra-row rule, so the
    * DuckDB ntile oracle is unchanged (r13 verdict item #1: no per-user
    * frame may funnel through one task). Each order carries a full
    * (metric, user_id) tie-break so the assignment is a total order on
    * both engines; recency orders days DESC for "bigger is better"
    * uniformity.
    */
  val rfmSegmentation = Q(
    "x_rfm_segmentation",
    (s, d) => {
      val ev = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"),
          (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
            .cast("long").as("cents"))
      // localCheckpoint: the per-user frame is model-scale (|users| rows, 4
      // columns) while its lineage scans the full event log. The rank
      // passes read their input from several jobs (one shared boundary
      // sketch, three per-slice windows, three offsets aggregates), so
      // without the checkpoint the 100 TB scan would re-run per job; with
      // it, the corpus is read ONCE — the anchor day too comes from the
      // aggregated frame (max of per-user last days == max event day), not
      // a second pass over the events.
      val users0 = ev.groupBy(col("user_id"))
        .agg(max(col("day")).as("last_day"), count(lit(1)).as("freq"),
          sum(col("cents")).as("cents"))
        .truncateLineage()
      // One stats job over the checkpointed frame serves both scalars the
      // plan needs (anchor day for recency, user count for ntile).
      val stats = users0.agg(max(col("last_day")).as("anchor"), count(lit(1)).as("__n"))
      val users = users0
        .crossJoin(broadcast(stats))
        .select(col("user_id"),
          datediff(col("anchor"), col("last_day")).cast("long").as("recency_days"),
          col("freq"), col("cents"), col("__n"))
      import graft.functions.Layout
      // twoPhaseRankAll: the three quintiles' literal slice boundaries come
      // from ONE multi-column approxQuantile pass over the checkpointed
      // user frame instead of three separate sketch jobs (r14 verdict #2).
      val ranked = Layout.twoPhaseRankAll(users,
        ("__rr", Seq(desc("recency_days"), asc("user_id"))),
        ("__fr", Seq(asc("freq"), asc("user_id"))),
        ("__mr", Seq(asc("cents"), asc("user_id"))))
      ranked
        .withColumn("r_score", Layout.ntileFromRank("__rr", "__n", 5))
        .withColumn("f_score", Layout.ntileFromRank("__fr", "__n", 5))
        .withColumn("m_score", Layout.ntileFromRank("__mr", "__n", 5))
        .select(col("user_id"), col("recency_days"), col("freq"), col("cents"),
          col("r_score"), col("f_score"), col("m_score"),
          (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("segment"))
        .orderBy("user_id")
    },
    Some("""WITH ev AS (
              SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
              FROM events WHERE event_type = 'purchase'),
            an AS (SELECT max(day) AS anchor FROM ev),
            u AS (
              SELECT user_id,
                CAST(date_diff('day', max(day), (SELECT anchor FROM an)) AS BIGINT) AS recency_days,
                count(*) AS freq, CAST(sum(cents) AS BIGINT) AS cents
              FROM ev GROUP BY user_id),
            sc AS (
              SELECT user_id, recency_days, freq, cents,
                CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS BIGINT) AS r_score,
                CAST(ntile(5) OVER (ORDER BY freq, user_id) AS BIGINT) AS f_score,
                CAST(ntile(5) OVER (ORDER BY cents, user_id) AS BIGINT) AS m_score
              FROM u)
            SELECT user_id, recency_days, freq, cents, r_score, f_score, m_score,
              CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS segment
            FROM sc ORDER BY user_id""")
  )

  /** Link prediction over the folded event graph (same 211-node fold as
    * [[triangleCount]]): for every NON-adjacent pair sharing at least one
    * neighbor, score common-neighbor count, Jaccard, and the
    * resource-allocation index (Zhou, Lü, Zhang 2009 — Σ 1/deg(v) over
    * common neighbors v, here Σ 1000000 div deg(v): per-term integer
    * quantization, order-independent and bit-exact). Top-20 candidates
    * under the (cn, ra, u, w) total order.
    *
    * Scale: the wedge join is keyed on the common neighbor v — the same
    * one-exchange shape as the triangle wedge — and its fan-out is deg(v)²;
    * at 100 TB hot hubs get the LSH-style capped-neighborhood treatment
    * (row_number ≤ cap per center with an in-row truncation report, the
    * x_fuzzy_join_edit discipline). The existing-edge exclusion is a
    * left-anti join on the canonical (lo, hi) edge set, not a quadratic
    * filter.
    */
  val linkPrediction = Q(
    "x_link_prediction",
    (s, d) => {
      val raw = Tables.events(s, d)
        .select((col("user_id") % 211).as("a"), (col("event_id") % 211).as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
        .distinct()
      val adj = raw.select(col("lo").as("v"), col("hi").as("u"))
        .union(raw.select(col("hi").as("v"), col("lo").as("u")))
      val deg = adj.groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val wd  = adj.join(deg, "v")
      val cand = wd
        .join(wd.select(col("v"), col("u").as("w")), "v")
        .filter(col("u") < col("w"))
        .groupBy(col("u"), col("w"))
        .agg(count(lit(1)).as("cn"), sum(expr("1000000 div deg")).as("ra_ppm"))
      cand
        .join(raw.select(col("lo").as("u"), col("hi").as("w")), Seq("u", "w"), "left_anti")
        .join(deg.select(col("v").as("u"), col("deg").as("deg_u")), "u")
        .join(deg.select(col("v").as("w"), col("deg").as("deg_w")), "w")
        .select(col("u"), col("w"), col("cn"), col("ra_ppm"),
          expr("cn * 1000000 div (deg_u + deg_w - cn)").as("jaccard_ppm"))
        .orderBy(desc("cn"), desc("ra_ppm"), col("u"), col("w"))
        .limit(20)
    },
    Some("""WITH raw AS (
              SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi FROM (
                SELECT user_id % 211 AS a, event_id % 211 AS b FROM events)
              WHERE a <> b),
            adj AS (SELECT lo AS v, hi AS u FROM raw UNION ALL SELECT hi, lo FROM raw),
            deg AS (SELECT v, count(*) AS deg FROM adj GROUP BY v),
            wd AS (SELECT a.v, a.u, d.deg FROM adj a JOIN deg d USING (v)),
            cand AS (
              SELECT x.u, y.u AS w, count(*) AS cn,
                CAST(sum(1000000 // x.deg) AS BIGINT) AS ra_ppm
              FROM wd x JOIN wd y ON x.v = y.v AND x.u < y.u
              GROUP BY 1, 2),
            ne AS (
              SELECT c.* FROM cand c
              LEFT JOIN raw r ON r.lo = c.u AND r.hi = c.w
              WHERE r.lo IS NULL)
            SELECT ne.u, ne.w, ne.cn, ne.ra_ppm,
              CAST(ne.cn * 1000000 // (du.deg + dw.deg - ne.cn) AS BIGINT) AS jaccard_ppm
            FROM ne JOIN deg du ON du.v = ne.u JOIN deg dw ON dw.v = ne.w
            ORDER BY cn DESC, ra_ppm DESC, u, w LIMIT 20""")
  )

  /** Hybrid retrieval via Reciprocal Rank Fusion (Cormack, Clarke,
    * Büttcher SIGIR'09: score = Σ 1/(60 + rank), here 1000000 div
    * (60+rank) — integer-exact): two independent rankers for the same
    * query — Okapi BM25 ([[graft.functions.QualityLM.bm25TopK]]) and a
    * plain tf·idf scorer — each produce a top-20 list, fused by summed
    * reciprocal ranks with absent-list contributions of 0. This is the
    * standard sparse+sparse/dense fusion shape of production RAG retrieval;
    * the ANN rankers drop in as a third list unchanged.
    *
    * Scale: each ranker is one corpus exchange (the bm25TopK shape); the
    * fusion joins two ≤20-row lists — the final windows/sorts touch
    * bounded-k frames only.
    */
  val hybridSearchRrf = Q(
    "x_hybrid_search_rrf",
    (s, d) => {
      import graft.functions.{QualityLM, TextAnalysis}
      val docs  = Tables.documents(s, d)
      val terms = Seq("hash", "join", "stream")
      val bm = QualityLM.bm25TopK(docs, "doc_id", "text", terms, topK = 20)
        .withColumn("rank_bm25",
          row_number().over(Window.orderBy(desc("score"), col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("rank_bm25"))
      val tok = docs
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val tfAggs = terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("tok") === t, 1L).otherwise(0L)).as(s"__tf$i")
      }
      val perDoc = tok.groupBy(col("doc_id")).agg(tfAggs.head, tfAggs.tail: _*)
      val model = perDoc.agg(
        count(lit(1)).cast("double").as("__n"),
        terms.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).cast("double").as(s"__df$i")): _*)
      val score = terms.indices.map { i =>
        when(col(s"__tf$i") > 0,
          floor(col(s"__tf$i").cast("double") * log(col("__n") / col(s"__df$i")) * 1e6 + 0.5)
            .cast("long"))
          .otherwise(0L)
      }.reduce(_ + _)
      val tf = perDoc
        .filter(terms.indices.map(i => col(s"__tf$i")).reduce(_ + _) > 0)
        .join(broadcast(model))
        .select(col("doc_id"), score.as("tscore"))
        .orderBy(desc("tscore"), col("doc_id"))
        .limit(20)
        .withColumn("rank_tfidf",
          row_number().over(Window.orderBy(desc("tscore"), col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("rank_tfidf"))
      bm.join(tf, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("rank_bm25"), lit(0L)).as("rank_bm25"),
          coalesce(col("rank_tfidf"), lit(0L)).as("rank_tfidf"),
          (coalesce(expr("CAST(1000000 DIV (60 + rank_bm25) AS BIGINT)"), lit(0L)) +
            coalesce(expr("CAST(1000000 DIV (60 + rank_tfidf) AS BIGINT)"), lit(0L)))
            .as("rrf_ppm"))
        .orderBy(desc("rrf_ppm"), col("doc_id"))
        .limit(15)
    },
    Some("""WITH toks AS (
              SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
              FROM documents),
            dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
            stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
            tfq AS (
              SELECT doc_id, tok, count(*) AS tf FROM toks
              WHERE tok IN ('hash', 'join', 'stream') GROUP BY 1, 2),
            dfreq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tfq GROUP BY 1),
            bs AS (
              SELECT tfq.doc_id,
                CAST(floor(
                  ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0) *
                  (CAST(tfq.tf AS DOUBLE) * (1.2 + 1.0)) /
                  (CAST(tfq.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / stats.avgdl)) *
                  1e6 + 0.5) AS BIGINT) AS sq
              FROM tfq JOIN dl ON tfq.doc_id = dl.doc_id
                       JOIN dfreq ON tfq.tok = dfreq.tok, stats),
            btop AS (
              SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_bm25
              FROM (SELECT doc_id, CAST(sum(sq) AS BIGINT) AS score FROM bs
                    GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 20)),
            ts AS (
              SELECT tfq.doc_id,
                CAST(sum(CAST(floor(CAST(tfq.tf AS DOUBLE) * ln(stats.n / dfreq.df) * 1e6 + 0.5)
                  AS BIGINT)) AS BIGINT) AS tscore
              FROM tfq JOIN dfreq ON tfq.tok = dfreq.tok, stats GROUP BY 1),
            ttop AS (
              SELECT doc_id, row_number() OVER (ORDER BY tscore DESC, doc_id) AS rank_tfidf
              FROM (SELECT * FROM ts ORDER BY tscore DESC, doc_id LIMIT 20))
            SELECT COALESCE(b.doc_id, t.doc_id) AS doc_id,
              COALESCE(b.rank_bm25, 0) AS rank_bm25,
              COALESCE(t.rank_tfidf, 0) AS rank_tfidf,
              COALESCE(1000000 // (60 + b.rank_bm25), 0)
                + COALESCE(1000000 // (60 + t.rank_tfidf), 0) AS rrf_ppm
            FROM btop b FULL OUTER JOIN ttop t ON b.doc_id = t.doc_id
            ORDER BY rrf_ppm DESC, doc_id LIMIT 15""")
  )

  /** The SQL twin of `rounds` Bellman-Ford relaxations: l_{r} = per-node min
    * over (l_{r-1} ∪ l_{r-1}⋈edges), unrolled as chained CTEs — linear in
    * rounds (a recursive UNION ALL walk would enumerate paths, exponential
    * on a dense fold).
    */
  private def ssspOracle(rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      s"""l$r AS (
            SELECT node, min(dist) AS dist FROM (
              SELECT node, dist FROM l${r - 1}
              UNION ALL
              SELECT e.dst, l.dist + e.w FROM l${r - 1} l JOIN e ON e.src = l.node)
            GROUP BY node)"""
    }.mkString(",\n            ")
    s"""WITH e AS (
              SELECT src, dst, min(w) AS w FROM (
                SELECT user_id % 211 AS src, event_id % 211 AS dst,
                  (user_id % 211 * 7 + event_id % 211 * 13) % 20 + 1 AS w
                FROM events)
              GROUP BY src, dst),
            l0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
            $steps
            SELECT node, dist FROM l$rounds ORDER BY node"""
  }

  /** Weighted single-source shortest paths ([[graft.functions.GraphOps
    * .ssspWeighted]], 6 Bellman-Ford rounds) over the folded event graph
    * with deterministic integer edge weights — the routing/etl-lineage
    * cost query that BFS hop counts can't answer. The oracle unrolls the
    * same 6 synchronous relaxations as chained CTEs, so distances are
    * row-level exact, not recall-gated.
    */
  val ssspWeightedQ = Q(
    "x_sssp_weighted",
    (s, d) =>
      graft.functions.GraphOps.ssspWeighted(
        Tables.events(s, d)
          .select((col("user_id") % 211).as("src"), (col("event_id") % 211).as("dst"),
            ((col("user_id") % 211) * 7 + (col("event_id") % 211) * 13).mod(20).plus(1).as("w")),
        "src", "dst", "w", source = 0L, rounds = 6)
        .orderBy("node"),
    Some(ssspOracle(6))
  )

  /** The SQL twin of `rounds` synchronous k-core peels: each round drops
    * every node whose surviving degree is < k, as chained CTEs (the
    * [[ssspOracle]] linear-unroll discipline).
    */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      s"""k$r AS (SELECT src AS node FROM e${r - 1} GROUP BY src HAVING count(*) >= $k),
            e$r AS (SELECT src, dst FROM e${r - 1}
                    WHERE src IN (SELECT node FROM k$r) AND dst IN (SELECT node FROM k$r))"""
    }.mkString(",\n            ")
    s"""WITH e0raw AS (
              SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi FROM (
                SELECT user_id % 211 AS a, event_id % 211 AS b FROM events)
              WHERE a <> b),
            dv AS (SELECT GREATEST(1, count(*) // 1500) AS d FROM e0raw),
            ek AS (SELECT lo, hi FROM e0raw, dv WHERE (lo * 31 + hi * 17) % dv.d = 0),
            e0 AS (SELECT lo AS src, hi AS dst FROM ek UNION ALL SELECT hi, lo FROM ek),
            $steps
            SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
            FROM e$rounds GROUP BY src ORDER BY node"""
  }

  /** k-core decomposition ([[graft.functions.GraphOps.kCore]], 6 bounded
    * synchronous peel rounds, k = 5) over a deterministically SPARSIFIED
    * fold of the event graph — the cohesive-subgraph extractor community
    * detection and spam/bot analysis start from, and the one iterative graph
    * shape the registry's PageRank/BFS/SSSP/LPA family lacked: state
    * SHRINKS monotonically (peeled nodes never return), so each round's
    * degree aggregation + two semi-joins touch at most the surviving |E|.
    * The sparsifier is DATA-DEPENDENT (keep ~1500 canonical edges via a
    * hash condition whose divisor derives from the edge count — the
    * `x_equidepth_histogram` fixed-SIZE-not-fixed-RATE discipline), because
    * a fixed-modulus fold SATURATES as data grows: at sf0.1 every folded
    * pair exists, and any fixed keep-rate yields a near-regular graph no k
    * peels. The divisor is one count (model scalar). The oracle unrolls the
    * same 6 peels as chained CTEs — membership AND final degrees are
    * row-level exact.
    */
  val kCoreQ = Q(
    "x_kcore",
    (s, d) => {
      val e0raw = Tables.events(s, d)
        .select((col("user_id") % 211).as("a"), (col("event_id") % 211).as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
        .distinct()
        .truncateLineage()
      val divisor = math.max(1L, e0raw.count() / 1500L)
      val e0 = e0raw.filter((col("lo") * 31 + col("hi") * 17) % divisor === 0)
      val edges = e0.select(col("lo").as("src"), col("hi").as("dst"))
        .union(e0.select(col("hi").as("src"), col("lo").as("dst")))
      graft.functions.GraphOps.kCore(edges, "src", "dst", k = 5, rounds = 6)
        .orderBy("node")
    },
    Some(kCoreOracle(5, 6))
  )

  def qs: Seq[Q] = Seq(
    invertedIndex, booleanSearch, winnowing, countMin, scd2, zoneMap, attributionLinear,
    scd2Lookup, triangleCount, fkAudit,
    resampleFfill, sortedNeighborhood, labelPropagation, bloomIndex,
    mvRetract, marketBasket, tfidfDocSim, driftTv, mmrDiversify,
    userLtv, rfmSegmentation, linkPrediction, hybridSearchRrf, ssspWeightedQ, kCoreQ,
    phraseSearch)

  /** Phrase query over a POSITIONAL inverted index — the search capability
    * term-set retrieval ([[booleanSearch]]) cannot express: "these words,
    * adjacent, in this order". Postings carry (doc, token, position); a
    * k-word phrase executes as k position-aligned joins — each posting
    * stream is first pruned to ONE phrase word against the broadcast
    * phrase row, so only matching-token postings ever reach the join
    * (cost = Σ posting lists of the phrase words, never a corpus scan —
    * the standard positional-index query plan, Manning IR §2.4.2). The
    * phrase itself is derived in-query (the corpus' most frequent word
    * trigram, ties lexicographic) so the query is self-contained and
    * deterministic. Occurrences are counted per doc, not just matched.
    *
    * Oracle: phrase selection replayed identically, then the DEFINITION of
    * a phrase hit — a row-local scan of each doc's token array — rather
    * than the index plan, so the index join is checked against ground
    * truth, not against itself.
    */
  val phraseSearch = Q(
    "x_phrase_search",
    (s, d) => {
      val words = Tables.documents(s, d)
        .select(col("doc_id"),
          filter(split(col("text"), " "), w => w =!= "").as("arr"))
        .filter(size(col("arr")) >= 3)
      val tri = words.select(explode(expr(
        """transform(sequence(0, size(arr) - 3),
           i -> concat_ws(' ', element_at(arr, i + 1), element_at(arr, i + 2), element_at(arr, i + 3)))"""))
        .as("ph"))
      val phrase = tri.groupBy("ph").agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), asc("ph")).limit(1)
        .select(
          element_at(split(col("ph"), " "), 1).as("w1"),
          element_at(split(col("ph"), " "), 2).as("w2"),
          element_at(split(col("ph"), " "), 3).as("w3"),
          col("ph"))
      val pos = words.select(col("doc_id"), posexplode(col("arr")).as(Seq("p", "w")))
      def sel(offset: Int, wcol: String) =
        pos.join(broadcast(phrase.select(col(wcol).as("pw"))), col("w") === col("pw"))
          .select(col("doc_id"), (col("p") - lit(offset)).as("p0"))
      sel(0, "w1")
        .join(sel(1, "w2"), Seq("doc_id", "p0"))
        .join(sel(2, "w3"), Seq("doc_id", "p0"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_matches"))
        .crossJoin(broadcast(phrase.select(col("ph").as("phrase"))))
        .select(col("doc_id"), col("phrase"), col("n_matches"))
        .orderBy("doc_id")
    },
    Some("""WITH words AS (
              SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS arr
              FROM documents),
            w3 AS (SELECT doc_id, arr FROM words WHERE len(arr) >= 3),
            tri AS (
              SELECT unnest(list_transform(range(1, len(arr) - 1),
                i -> array_to_string(arr[i:i+2], ' '))) AS ph
              FROM w3),
            phrase AS (
              SELECT ph FROM (SELECT ph, count(*) AS c FROM tri GROUP BY ph)
              ORDER BY c DESC, ph LIMIT 1),
            hits AS (
              SELECT w3.doc_id, phrase.ph AS phrase,
                CAST(len(list_filter(range(1, len(arr) - 1),
                  i -> array_to_string(arr[i:i+2], ' ') = phrase.ph))
                  AS BIGINT) AS n_matches
              FROM w3 CROSS JOIN phrase)
            SELECT doc_id, phrase, n_matches FROM hits
            WHERE n_matches > 0 ORDER BY doc_id""")
  )
}
