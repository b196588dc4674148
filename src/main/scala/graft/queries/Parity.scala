package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.RainStormOps
import graft.operators.RainStormOps._

/** Reference-parity queries: one per operator row of SURVEY.md §2 (F =
  * framework operators, U = user operator exes, G = grep surface), expressed
  * over the driver's testdata tables. Each cites the reference file:line it
  * covers and ships a DuckDB oracle.
  */
object Parity {

  /** F1 — file source scan emitting keyed tuples `<file:lineNo, line>`
    * (`ReadFilePartition`, `core_process_utils.go:646-690`). Here the lineage
    * key is `source:doc_id` — stable identity, not a physical line number.
    */
  val f1 = Q(
    "f1_source_scan",
    (s, d) =>
      Tables.documents(s, d)
        .select(concat_ws(":", col("source"), col("doc_id")).as("key"), col("text").as("value"))
        .orderBy("key"),
    Some("""SELECT source || ':' || CAST(doc_id AS VARCHAR) AS key, text AS value
            FROM documents ORDER BY key""")
  )

  /** F2 — fair range partitioning (`GetFairPartitions`,
    * `core_process_utils.go:1296-1318`).
    *
    * HARNESS-ONLY FORM: the ntile-over-global-window below exists solely so
    * the oracle can hash a deterministic partition assignment — it is a
    * single-task presentation and must never be used as the engine path. The
    * actual scale mechanism is `repartitionByRange` (a sampled
    * RangePartitioning exchange, every task parallel), pinned by PlanSpec's
    * "f2 scale mechanism" test.
    */
  val f2 = Q(
    "f2_range_partition",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), ntile(32).over(Window.orderBy("doc_id")).cast("long").as("part_id"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, ntile(32) OVER (ORDER BY doc_id) AS part_id
            FROM documents ORDER BY doc_id""")
  )

  /** F3 — deterministic hash re-key for the stage-1→stage-2 shuffle
    * (`MapHashableToNodeAndTask`, `core_process_utils.go:2398-2414`, SHA-1
    * based). Spark's exchange does this implicitly; the portable md5 bucket
    * key makes the routing observable and oracle-checkable.
    */
  val f3 = Q(
    "f3_hash_partition",
    (s, d) =>
      pipeline(Tables.documents(s, d), rekey(col("doc_id")))
        .select(col("doc_id"), col("bucket_key"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS bucket_key
            FROM documents ORDER BY doc_id""")
  )

  /** F4 — exactly-once dedup (`seen_storage_map`,
    * `core_process_stream_DS.go:869-875,1170-1176`): first-wins per unique
    * key, expressed deterministically as min-by-key.
    */
  val f4 = Q(
    "f4_dedup_exactly_once",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min("event_id").as("first_event"), count(lit(1)).as("n_seen"))
        .orderBy("user_id", "event_type"),
    Some("""SELECT user_id, event_type, min(event_id) AS first_event, count(*) AS n_seen
            FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type""")
  )

  /** F4 batch view of the STREAMING dedup operator
    * ([[graft.streaming.RainStorm.dedupStream]]): a replayed source (the
    * same tuples delivered twice) collapses to exactly-once output by unique
    * id. Replay is simulated as self-union; dropDuplicates is the same
    * first-wins-per-key semantics the streaming form applies per micro-batch.
    */
  val f4b = Q(
    "f4b_dedup_replay",
    (s, d) => {
      val e = Tables.events(s, d).select(col("event_id"), col("user_id"), col("event_type"))
      e.unionByName(e) // the replay
        .dropDuplicates("event_id")
        .orderBy("event_id")
    },
    Some("""SELECT DISTINCT event_id, user_id, event_type FROM events ORDER BY event_id""")
  )

  /** F6 — stateless collect sink: output map keyed by value, duplicates
    * collapse (`core_process_stream_DS.go:1186-1206`) — a set, not a bag.
    */
  val f6 = Q(
    "f6_distinct_collect_sink",
    (s, d) =>
      pipeline(Tables.documents(s, d), distinctCollect(col("lang"), col("source")))
        .orderBy("lang", "source"),
    Some("""SELECT DISTINCT lang, source FROM documents ORDER BY lang, source""")
  )

  /** F7 — `quantify`: unique-record count of the merged output
    * (`QuantifyHydfsFile`, `core_process_utils.go:164-236`).
    */
  val f7 = Q(
    "f7_quantify",
    (s, d) =>
      Tables.documents(s, d).agg(count_distinct(col("text")).as("uniq_records")),
    Some("""SELECT count(DISTINCT text) AS uniq_records FROM documents""")
  )

  /** U1 — split flatMap (`misc/split_operator.go:11-35`). */
  val u1 = Q(
    "u1_split_flatmap",
    (s, d) =>
      pipeline(Tables.documents(s, d), splitWords(col("text"))).orderBy("word"),
    Some("""SELECT word FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE word <> '' ORDER BY word""")
  )

  /** U2 — stateful count-by-key = word count (`operators/count_operator.go:
    * 16-112`). Spark's partial→final hash aggregate adds the map-side combine
    * the reference lacks (SURVEY §4).
    */
  val u2 = Q(
    "u2_wordcount",
    (s, d) =>
      pipeline(Tables.documents(s, d), splitWords(col("text")), countByKey(col("word")))
        .orderBy("word"),
    Some("""SELECT word, count(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE word <> '' GROUP BY word ORDER BY word""")
  )

  /** U3 — FilteredTransform, contains-predicate + projection
    * (`operators/app1_1.go:14-60`).
    */
  val u3 = Q(
    "u3_filter_contains_project",
    (s, d) =>
      pipeline(
        Tables.documents(s, d),
        filteredTransform(col("text").contains("stream"))(col("doc_id"), col("source"), col("n_chars"))
      ).orderBy("doc_id"),
    Some("""SELECT doc_id, source, n_chars FROM documents
            WHERE text LIKE '%stream%' ORDER BY doc_id""")
  )

  /** U4 — Transform, pure projection (`operators/app1_2.go:13-43`). */
  val u4 = Q(
    "u4_project",
    (s, d) =>
      pipeline(Tables.documents(s, d), RainStormOps.transform(col("doc_id"), col("lang"), col("n_chars")))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id""")
  )

  /** U5 — FilteredTransform, equality predicate (`operators/app2_1.go:11-57`). */
  val u5 = Q(
    "u5_filter_eq_project",
    (s, d) =>
      pipeline(
        Tables.events(s, d),
        filteredTransform(col("event_type") === "error")(col("event_id"), col("user_id"), col("value"))
      ).orderBy("event_id"),
    Some("""SELECT event_id, user_id, value FROM events
            WHERE event_type = 'error' ORDER BY event_id""")
  )

  /** U6 — FilteredTransform, numeric θ-predicate `rate <= 0.5`
    * (`misc/rate_filter_operator.go:11-49`).
    */
  val u6 = Q(
    "u6_filter_numeric",
    (s, d) =>
      pipeline(
        Tables.lineitem(s, d),
        filteredTransform(col("l_discount") <= 0.05)(col("l_orderkey"), col("l_linenumber"), col("l_discount"))
      ).orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_discount FROM lineitem
            WHERE l_discount <= 0.05 ORDER BY l_orderkey, l_linenumber""")
  )

  /** U7∘U8 — conjunction of two chained FilteredTransforms
    * (`misc/rate_filter_op_1.go` + `rate_filter_op_2.go`): op1∘op2 compose as
    * chained filters, which Catalyst merges into one scan predicate.
    */
  val u7u8 = Q(
    "u7_u8_conjunction",
    (s, d) =>
      pipeline(
        Tables.orders(s, d),
        filteredTransform(col("o_orderstatus") === "F")(col("o_orderkey"), col("o_orderpriority")),
        filteredTransform(col("o_orderpriority") === "1-URGENT")(col("o_orderkey"))
      ).orderBy("o_orderkey"),
    Some("""SELECT o_orderkey FROM orders
            WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT' ORDER BY o_orderkey""")
  )

  /** U9∘U10 — the lichess simple pipeline shape (`misc/lichess_op_1.go` +
    * `lichess_op_2.go`): equality + second predicate → id projection.
    */
  val u9u10 = Q(
    "u9_u10_filter_pipeline",
    (s, d) =>
      pipeline(
        Tables.events(s, d),
        filteredTransform(col("event_type") === "purchase" && col("value") > 100.0)(col("event_id"))
      ).orderBy("event_id"),
    Some("""SELECT event_id FROM events
            WHERE event_type = 'purchase' AND value > 100.0 ORDER BY event_id""")
  )

  /** U11 — complex FilteredTransform + count-by-key (`misc/lichess_operator_1
    * .go:13-57`): multi-predicate with IN-lists feeding a grouped count.
    */
  val u11 = Q(
    "u11_complex_agg",
    (s, d) =>
      pipeline(
        Tables.orders(s, d),
        filteredTransform(
          col("o_orderstatus") === "O" && col("o_totalprice") > 1000.0 &&
            col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
        )(col("o_orderpriority")),
        countByKey(col("o_orderpriority"))
      ).orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, count(*) AS cnt FROM orders
            WHERE o_orderstatus = 'O' AND o_totalprice > 1000.0
              AND o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM')
            GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  /** U12 — batch oracle of the same query (`misc/operator_lichess.go:13-65`):
    * the reference's own golden-output generator is the identical computation
    * run in batch; here both run through the same registry path.
    */
  val u12 = Q(
    "u12_batch_oracle",
    (s, d) => {
      val op1 = registry("filter_eq")("o_orderstatus=O")
      val agg = countByKey(col("o_orderpriority"))
      pipeline(
        Tables.orders(s, d).filter(col("o_totalprice") > 1000.0)
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")),
        op1,
        agg
      ).orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS cnt FROM orders
            WHERE o_orderstatus = 'O' AND o_totalprice > 1000.0
              AND o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM')
            GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  )

  /** G1 — scatter-gather grep, per-"machine" counts (`core_process.go:259-349`):
    * regex scan with per-source aggregation.
    */
  val g1 = Q(
    "g1_grep_per_file",
    (s, d) =>
      Tables.documents(s, d)
        .filter(col("text").rlike("merge|stream"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("matches"))
        .orderBy("source"),
    Some("""SELECT source, count(*) AS matches FROM documents
            WHERE regexp_matches(text, 'merge|stream') GROUP BY source ORDER BY source""")
  )

  /** G1 total + `-c` mode (`core_process.go:292-344` grand total). */
  val g2 = Q(
    "g2_grep_count",
    (s, d) =>
      Tables.documents(s, d)
        .filter(col("text").rlike("merge|stream"))
        .agg(count(lit(1)).as("matches")),
    Some("""SELECT count(*) AS matches FROM documents
            WHERE regexp_matches(text, 'merge|stream')""")
  )

  /** G1 pipe-chain + invert: `grep 'merge' | grep -v 'stream'`
    * (`different_grep_commands_test.go:60-68` exercises pipes/-v).
    */
  val g3 = Q(
    "g3_grep_pipe_invert",
    (s, d) =>
      Tables.documents(s, d)
        .filter(col("text").rlike("merge") && !col("text").rlike("stream"))
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, source FROM documents
            WHERE regexp_matches(text, 'merge') AND NOT regexp_matches(text, 'stream')
            ORDER BY doc_id""")
  )

  /** G1 long-tail: `grep -o` (only-matching — one row per regex MATCH with
    * its in-text position, the shape [[graft.operators.GrepEngine]] emits
    * for `-o` stages). The reference gets `-o` for free by shelling out to
    * real grep (`core_process.go:91-124`); here it is a codegen'd
    * regexp_extract_all + posexplode — still a pure scan-stage map, no
    * shuffle before the presentation sort.
    */
  val g4 = Q(
    "g4_grep_only_matching",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(regexp_extract_all(col("text"), lit("merge|stream"), lit(0)))
            .as(Seq("pos", "m")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("m"))
        .orderBy("doc_id", "pos"),
    Some("""SELECT doc_id, CAST(u.i AS BIGINT) AS pos, u.m AS m FROM (
              SELECT doc_id, unnest(list_transform(range(len(ms)),
                i -> {'i': i, 'm': ms[i+1]})) AS u
              FROM (SELECT doc_id, regexp_extract_all(text, 'merge|stream') AS ms
                    FROM documents))
            ORDER BY doc_id, pos""")
  )

  /** G1 long-tail: `grep -w` (whole-word match) vs the plain substring scan
    * — per-doc counts of word-`a` and any-`a` occurrences side by side, so
    * the boundary semantics are visible in the data. The Spark side uses
    * the Java-regex lookaround form [[graft.operators.GrepEngine]] emits
    * for `-w`; the DuckDB replay uses RE2's `\b` — equivalent whenever the
    * pattern starts and ends with word characters (RE2 has no lookarounds,
    * Java's \b agrees with the lookaround form on word-char patterns).
    */
  val g5 = Q(
    "g5_grep_word_count",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"),
            lit("(?<![0-9A-Za-z_])a(?![0-9A-Za-z_])"), lit(0))).cast("long").as("word_a"),
          size(regexp_extract_all(col("text"), lit("a"), lit(0))).cast("long").as("any_a"))
        .filter(col("word_a") > 0)
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
              CAST(len(regexp_extract_all(text, '\ba\b')) AS BIGINT) AS word_a,
              CAST(len(regexp_extract_all(text, 'a')) AS BIGINT) AS any_a
            FROM documents
            WHERE len(regexp_extract_all(text, '\ba\b')) > 0
            ORDER BY doc_id""")
  )

  /** U2 again through the two-phase salted aggregation — identical results
    * (same oracle), different physical plan: the skew-resilient form for hot
    * keys. Both stay in the registry so the driver checks the equivalence.
    */
  val u2salted = Q(
    "u2_wordcount_salted",
    (s, d) =>
      pipeline(Tables.documents(s, d), splitWords(col("text")), saltedCountByKey(col("word")))
        .orderBy("word"),
    Some("""SELECT word, count(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE word <> '' GROUP BY word ORDER BY word""")
  )

  val qs: Seq[Q] =
    Seq(f1, f2, f3, f4, f4b, f6, f7, u1, u2, u2salted, u3, u4, u5, u6, u7u8, u9u10, u11, u12, g1, g2, g3, g4, g5)
}
